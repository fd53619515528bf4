"""The driver-facing queries() ordering contract (__spark_entry__.py):

- the unverified block comes first and its ORDER is exactly the
  pre-recheck ordering (wine_* first, then registration order) — the
  recheck tier must never perturb the slate;
- the recheck tier (changed-since-green names) immediately follows,
  and every name in it exists, is verified-green, and has an oracle
  (a typo or a stale name would silently waste driver slots).
"""

from __future__ import annotations

import importlib.util
import pathlib


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_under_test__",
        str(pathlib.Path(__file__).resolve().parents[1] / "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_unverified_block_order_is_slate_stable():
    mod = _entry()
    green = mod._verified_names()
    names = list(mod.queries())
    n_unver = sum(1 for n in names if n not in green)
    front = names[:n_unver]
    assert all(n not in green for n in front)
    baseline = sorted(
        mod.plans.QUERIES, key=lambda n: (n in green, not n.startswith("wine_"))
    )
    assert front == baseline[:n_unver], (
        "recheck tier perturbed the unverified front block"
    )


def test_recheck_names_are_live_verified_oracled():
    mod = _entry()
    green = mod._verified_names()
    names = list(mod.queries())
    n_unver = sum(1 for n in names if n not in green)
    # reconstruct the tier from the ordering: verified names that sort
    # before the first wine_* of the verified tail
    tail = names[n_unver:]
    tier = []
    for n in tail:
        if n.startswith("wine_"):
            break
        tier.append(n)
    # an empty tier is legal (every recheck name re-verified + removed)
    for n in tier:
        assert n in mod.plans.QUERIES, f"stale recheck name {n}"
        assert n in green, f"unverified name {n} belongs in the slate, not recheck"
        assert n in mod.plans.ORACLES, f"recheck name {n} has no oracle"
