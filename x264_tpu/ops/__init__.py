"""Batched DSP primitives (the TPU analogue of x264's L2 dispatch tables).

Every function operates on arrays whose *leading* dimensions are batch
dimensions (macroblocks, candidates, blocks); the trailing dimensions are the
fixed spatial block shape. All integer ops use int32 and reproduce the
reference's bit-exact semantics.
"""
