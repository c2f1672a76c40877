#!/usr/bin/env python
"""Pre-commit gate: refuse to commit engine/entry edits with stale
contract evidence (the r3/r6 end-of-round failure mode).

Runs only the SPARK-FREE fast checks, so it costs ~2 s per commit:

1. ``tests/test_ledger_fresh.py`` — the committed CONTRACT_FULL /
   CONTRACT_SF01 ledgers must carry the sha256 of the CURRENT contract
   surface. Any engine edit flips this until scripts/check_contract.py
   is re-run at sf0.01 AND sf0.1 and the fresh ledgers are staged with
   the edit.
2. Exchange-budget coverage — every ``queries()`` entry must have an
   ``EXCHANGE_BUDGETS`` entry (or be in the streaming SKIP set). This
   is the registration half of tests/test_plan_budgets.py without the
   Spark session; the budget VALUES are still enforced by the full
   pytest run.

Installed by scripts/install_hooks.sh as .git/hooks/pre-commit (the
hook only fires when __spark_entry__.py or cuplyr_spark/ is staged).
Bypass for WIP commits with ``git commit --no-verify`` — the full
pytest suite still fails until the ledgers are regenerated.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_ledger_fresh.py", "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO,
    )
    if rc:
        print(
            "\npre-commit gate: contract ledgers are STALE for the staged "
            "engine edit.\nRegenerate BOTH and stage them with the change:\n"
            "  python scripts/check_contract.py /root/testdata/sf0.01 --json CONTRACT_FULL_rN.json\n"
            "  python scripts/check_contract.py /root/testdata/sf0.1  --json CONTRACT_SF01_rN.json",
            file=sys.stderr,
        )
        return rc

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import __spark_entry__ as entrymod
    from test_plan_budgets import EXCHANGE_BUDGETS, SKIP  # type: ignore

    missing = sorted(set(entrymod.queries()) - set(EXCHANGE_BUDGETS) - SKIP)
    if missing:
        print(
            f"pre-commit gate: queries without an exchange budget: {missing}\n"
            "Audit each plan and add an EXCHANGE_BUDGETS entry in "
            "tests/test_plan_budgets.py.",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
