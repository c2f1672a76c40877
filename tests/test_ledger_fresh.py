"""Ledger-staleness guard.

Round 3 shipped two regressions because the committed full-contract
ledger (CONTRACT_FULL_r3.json) was generated four commits before the
last entry edit — green evidence for code that no longer existed. This
test makes that impossible to repeat silently: the newest committed
CONTRACT_FULL_*.json must (a) exist, (b) be a FULL run (not a partial
--json run over a query subset), (c) be fully green, and (d) carry the
sha256 of the CURRENT contract surface (__spark_entry__.py + every
cuplyr_spark module). Any engine or entry edit flips (d) until

    python scripts/check_contract.py /root/testdata/sf0.01 \
        --json CONTRACT_FULL_rN.json

is re-run and committed alongside the edit.

No Spark session needed — this is a pure file check, so it stays cheap
enough to run in every pytest invocation.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from check_contract import source_hash  # noqa: E402


def _latest_ledger(prefix: str = "CONTRACT_FULL") -> str | None:
    paths = glob.glob(os.path.join(REPO, f"{prefix}_r*.json"))

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=round_no) if paths else None


def test_full_contract_ledger_is_fresh_and_green():
    path = _latest_ledger()
    assert path, "no CONTRACT_FULL_r*.json ledger committed"
    with open(path) as f:
        ledger = json.load(f)
    assert not ledger.get("partial"), (
        f"{os.path.basename(path)} is a partial run over "
        f"{ledger['partial']} — regenerate over ALL queries"
    )
    bad = {
        n: v.get("err") or v["status"]
        for n, v in ledger["queries"].items()
        if v["status"] == "FAIL"
    }
    assert not bad, f"{os.path.basename(path)} has failing queries: {bad}"
    recorded = ledger.get("source_hash")
    assert recorded, (
        f"{os.path.basename(path)} predates source-hash stamping — regenerate"
    )
    current = source_hash()
    assert recorded == current, (
        f"{os.path.basename(path)} is STALE: the contract surface changed "
        "since it was generated. Re-run scripts/check_contract.py with "
        "--json and commit the fresh ledger with the code change."
    )


def test_sf01_contract_ledger_is_fresh_and_green():
    """The driver's oracle gate runs at sf0.01 but its bench (and the
    round-3 fixture-scale incident) showed drift can hide below sf0.1.
    Since round 5 the FULL contract is also verified at sf0.1 and the
    ledger is held to the same freshness bar as the sf0.01 one."""
    path = _latest_ledger("CONTRACT_SF01")
    assert path, "no CONTRACT_SF01_r*.json ledger committed"
    with open(path) as f:
        ledger = json.load(f)
    assert ledger["sf_dir"].rstrip("/").endswith("sf0.1"), ledger["sf_dir"]
    assert not ledger.get("partial"), (
        f"{os.path.basename(path)} is a partial run — regenerate over ALL queries"
    )
    bad = {
        n: v.get("err") or v["status"]
        for n, v in ledger["queries"].items()
        if v["status"] == "FAIL"
    }
    assert not bad, f"{os.path.basename(path)} has failing queries: {bad}"
    assert ledger.get("source_hash") == source_hash(), (
        f"{os.path.basename(path)} is STALE: re-run "
        "scripts/check_contract.py /root/testdata/sf0.1 --json and commit."
    )
