"""Regenerate tests/plan_snapshots.json after an INTENTIONAL plan
change. Prints the before/after fingerprint and the new plan text for
every moved pin so the diff can be reviewed before committing.

Usage: python tools/update_plan_snapshots.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_snapshots import main

if __name__ == "__main__":
    raise SystemExit(main())
