"""CI guard: README/RESULTS headline numbers must match committed artifacts.

VERDICT r4 weak #3: every round shipped stale headline docs after better
runs landed.  tools/check_headlines.py makes the drift mechanical: citation
accuracy, no-supersession (a better on-disk run than the headline fails),
citation existence + committed-ness.  This test just runs it.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import check_headlines  # noqa: E402


def test_headlines_match_artifacts():
    errors = check_headlines.check()
    assert not errors, "\n".join(errors)
