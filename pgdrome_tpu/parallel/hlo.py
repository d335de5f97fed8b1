"""Compiled-HLO inspection: make the sharding claims falsifiable.

GSPMD turns sharding annotations into collectives at compile time; the
repo's multichip story (SURVEY.md §2.4, parallel/enrich.py) asserts
that dim-0 'sp' sharding induces cross-shard reductions and the 'dp'
axis stays embarrassingly parallel.  Nothing enforced that until now —
a wrong PartitionSpec silently falls back to all-replicated and the
"sharded" program is a broadcast.  These helpers lower a jitted
callable, compile it for its mesh, and count the collective ops in the
optimized HLO so tests can assert the communication pattern instead of
trusting the annotations (round-4 VERDICT weak #4)."""

from __future__ import annotations

import re

__all__ = ["compiled_hlo", "collective_inventory", "assert_collectives"]

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def compiled_hlo(jitted, *args, **kwargs):
    """Optimized post-GSPMD HLO text of ``jitted`` for the given example
    arguments (compiles for the annotated mesh; on virtual CPU devices
    this is exactly the partitioned program a TPU mesh would run,
    modulo backend-specific fusions)."""
    return jitted.lower(*args, **kwargs).compile().as_text()


def collective_inventory(hlo_text: str):
    """Count collective instructions per kind in optimized HLO text.

    Matches instruction forms (`all-reduce(`, `all-reduce-start(`, and
    XLA's `all-reduce.12(` clones); returns ``{kind: count}`` with every
    kind from the known inventory present (0 when absent) so tests can
    assert both presence AND absence."""
    out = {}
    for kind in _COLLECTIVES:
        pat = re.compile(
            r"=\s*\S+\s+%?" + re.escape(kind) + r"(?:-start)?[.\d]*\("
        )
        out[kind] = len(pat.findall(hlo_text))
    return out


def assert_collectives(hlo_text: str, expect_present=(), expect_absent=()):
    """Assert the communication pattern of a compiled program: every
    kind in ``expect_present`` occurs at least once, every kind in
    ``expect_absent`` not at all.  Raises AssertionError with the full
    inventory in the message."""
    inv = collective_inventory(hlo_text)
    missing = [k for k in expect_present if inv.get(k, 0) == 0]
    stray = [k for k in expect_absent if inv.get(k, 0) > 0]
    if missing or stray:
        raise AssertionError(
            f"collective pattern mismatch: missing {missing}, "
            f"unexpected {stray}; inventory {inv}"
        )
    return inv
