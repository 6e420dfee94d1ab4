"""Collective-schedule audit helpers (VERDICT r2 task 3).

The graph-parallel contract (SURVEY.md §2.3): band-level activations are
V-sharded and move via `collective-permute` halo exchanges; GSPMD must NOT
fall back to `all-gather`-ing them.  Presence of collective-permute alone
does not prove the negative — these helpers parse the compiled HLO's
all-gather result shapes so callers can assert no V-sized activation is
gathered (small dense/joint levels and scalar reductions may still
replicate freely).
"""
from __future__ import annotations

import re
from typing import List, Tuple

__all__ = ["all_gather_sizes", "all_gather_entries",
           "assert_no_large_all_gather"]

_SHAPE_RE = re.compile(r"=\s*(?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*)\s*all-gather\(")
_ELEM_RE = re.compile(r"[a-z0-9]+\[([0-9,]*)\]")


def all_gather_entries(hlo_text: str) -> List[Tuple[int, str]]:
    """(result element count, op_name metadata) of every all-gather."""
    out: List[Tuple[int, str]] = []
    name_re = re.compile(r'metadata={op_name="([^"]*)"')
    for line in hlo_text.splitlines():
        if "all-gather(" not in line:
            continue
        head = line.split("all-gather(")[0]
        # result type(s) appear between '=' and the op name; tuples list
        # each member shape
        if "=" not in head:
            continue
        rhs = head.split("=", 1)[1]
        total = 0
        for m in _ELEM_RE.finditer(rhs):
            dims = m.group(1)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n
        if total:
            m = name_re.search(line)
            out.append((total, m.group(1) if m else ""))
    return out


def all_gather_sizes(hlo_text: str) -> List[int]:
    """Result element counts of every all-gather in an HLO dump."""
    return [s for s, _ in all_gather_entries(hlo_text)]


def assert_no_large_all_gather(hlo_text: str, threshold_elems: int,
                               context: str = "",
                               allow_re: str | None = None,
                               allow_max: int | None = None) -> None:
    """Fail if any all-gather result reaches `threshold_elems` elements.

    `threshold_elems` should be the smallest V-sharded band activation
    (V_band_min * batch * min_feat): an all-gather that large means a
    sharded band tensor was replicated instead of halo-exchanged.

    allow_re: optional regex over the op_name metadata for gathers that are
    allowed regardless of size — e.g. the level-boundary upsample remaps
    (`jit\\(_take\\)`), which shuffle the V axis by construction and occur
    exactly once per level transition, not per conv/hop.

    allow_max: upper bound on how many >=threshold gathers the allow_re may
    excuse.  jnp.take lowers MANY ops (face-loss gathers, extract_mesh,
    vertex gathers), so an unbounded allowlist would silently pass a future
    regression that all-gathers a band activation around any take-shaped
    op; callers should pass the number of level-boundary transitions.
    """
    entries = all_gather_entries(hlo_text)
    allow = re.compile(allow_re) if allow_re else None
    big, allowed = [], []
    for s, n in entries:
        if s < threshold_elems:
            continue
        (allowed if (allow and allow.search(n)) else big).append((s, n))
    assert not big, (
        f"{context}: {len(big)} all-gather op(s) at "
        f"{sorted(big)[-3:]} >= band-activation threshold {threshold_elems}; "
        f"the V-sharded band path must use collective-permute halos, not "
        f"all-gather"
    )
    if allow_max is not None:
        assert len(allowed) <= allow_max, (
            f"{context}: {len(allowed)} allowlisted (>= {threshold_elems} "
            f"elem) all-gathers exceed the {allow_max} level-boundary "
            f"transitions — a take-shaped op beyond the upsample remaps is "
            f"gathering a sharded band activation: {sorted(allowed)[-5:]}"
        )
