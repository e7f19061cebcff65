"""Guards for the benchmark tooling's variant grammar.

The anatomy numbers in docs/DESIGN.md §5b/5d/5e are only comparable if
composable tokens ("int8", "remat[stages]", the "swin_" workload prefix)
never change what the equality-matched sub-variant measures.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))

from step_anatomy import parse_variant  # noqa: E402


@pytest.mark.parametrize("variant,want", [
    ("full", (False, "full", None)),
    ("bf16", (False, "bf16", None)),
    ("fp", (False, "fp", None)),
    ("int8_bf16", (False, "bf16", None)),
    ("int8_noteacher", (False, "noteacher", None)),
    ("swin_bf16", (True, "bf16", None)),
    ("swin_fp", (True, "fp", None)),
    ("swin_int8_bf16", (True, "bf16", None)),
    # remat composes like int8: the sub-variant survives the token
    ("swin_fwd_remat", (True, "fwd", (0, 1))),
    ("swin_noteacher_remat", (True, "noteacher", (0, 1))),
    ("swin_remat_int8", (True, "full", (0, 1))),
    ("swin_bf16_remat0", (True, "bf16", (0,))),
    ("swin_bf16_remat01", (True, "bf16", (0, 1))),
])
def test_parse_variant(variant, want):
    assert parse_variant(variant) == want


def test_wait_for_backend_probes_cpu():
    """The bench backend probe must succeed quickly on a healthy backend
    (the failure path was exercised live against a hung tunnel: exit 3)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    assert bench.wait_for_backend(attempts=1, probe_timeout=120) == "cpu"
