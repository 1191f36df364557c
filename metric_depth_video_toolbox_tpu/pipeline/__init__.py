"""Pipeline stages: streaming host drivers around jitted device steps.

Each stage preserves the reference's file contract (inputs/outputs and
naming) and its resume-by-existence semantics, but processes *batches of
frames per device step* instead of one frame per Python iteration.
"""
