"""Bridge to run the ACTUAL reference (torch/CUDA) code on CPU.

The reference hard-requires CUDA (linear.py:113-117, conv.py:145-149,
matmul.py:97-101 raise EnvironmentError; `.cuda()` re-uploads throughout the
search loops). On this CPU-torch image those gates are the only obstacle: the
math is stock torch ops. We stub them — `torch.cuda.is_available` -> True, a
fake `get_device_properties` with a large `total_memory` (so `parallel_eq_n`
covers all candidates for the tiny test tensors), and identity
`Tensor.cuda`/`Module.cuda` — then import the reference modules verbatim from
/root/reference with its flat-package sys.path layout.

This gives the differential tests (test_ref_differential.py) the strongest
parity evidence this environment permits: our JAX searches compared against
the UPSTREAM implementation itself, not a re-implementation of it.
"""

import contextlib
import sys
from types import SimpleNamespace

_REF_ROOT = "/root/reference"
_cache = None


@contextlib.contextmanager
def cuda_stubs():
    """Patch torch's CUDA surface to no-op CPU passthroughs for the duration.

    Restores everything on exit so the rest of the suite sees stock torch.
    """
    import torch

    saved = (torch.cuda.is_available, torch.cuda.get_device_properties,
             torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.cuda.is_available = lambda: True
    torch.cuda.get_device_properties = (
        lambda idx=0: SimpleNamespace(total_memory=64 << 30))
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield torch
    finally:
        (torch.cuda.is_available, torch.cuda.get_device_properties,
         torch.Tensor.cuda, torch.nn.Module.cuda) = saved


def load_reference():
    """Import the reference quant_layers/quantizers from /root/reference.

    Import is done once per process; module-level code in the reference does
    not touch CUDA, so no stubs are needed at import time.
    """
    global _cache
    if _cache is not None:
        return _cache
    if _REF_ROOT not in sys.path:
        # append (not prepend) so repo modules always win name lookups
        sys.path.append(_REF_ROOT)
    import quant_layers.linear as ref_linear  # noqa: E402
    import quant_layers.matmul as ref_matmul  # noqa: E402
    import quant_layers.conv as ref_conv      # noqa: E402
    import quantizers.logarithm as ref_logarithm  # noqa: E402
    import quantizers.uniform as ref_uniform  # noqa: E402
    _cache = SimpleNamespace(linear=ref_linear, matmul=ref_matmul,
                             conv=ref_conv, logarithm=ref_logarithm,
                             uniform=ref_uniform)
    return _cache
