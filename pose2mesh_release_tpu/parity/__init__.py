"""Parity harness: reference-checkpoint conversion + activation diffing.

`torch_ref` re-implements the reference architecture in torch with the
reference's exact state-dict key layout (lib/models/posenet.py,
lib/models/meshnet.py), so real `final.pth.tar` checkpoints load into it
and `convert` maps them onto this framework's flax parameter tree.
`tests/test_parity.py` proves end-to-end allclose between the two stacks.
"""
from .convert import convert_cascade_state_dict, load_torch_checkpoint

__all__ = ["convert_cascade_state_dict", "load_torch_checkpoint"]
