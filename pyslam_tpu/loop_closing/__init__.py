"""Loop closing: place recognition, geometric verification, map correction.

Reference: pySLAM ``pyslam/loop_closing/`` (SURVEY.md section 2.3).  The
detector computes global descriptors with batched device ops (descriptor ->
word quantization is one MXU Hamming matmul against the vocabulary); the
inverted index and consistency bookkeeping stay host-side; geometry checks
run the batched Sim3 RANSAC + Sim3 LM refine; correction uses the Sim(3)
essential-graph PGO from the optimizer core.
"""
