"""Release/version checking (network-gated).

Role parity with reference ``whisperjav/version_checker.py`` /
``upgrade.py`` (GitHub release polling + self-update). In zero-egress
environments every check returns None gracefully; the ``upgrade``
entry point prints guidance instead of mutating the install — wheel
self-replacement is a package-manager concern in this distribution.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Dict, Optional

from whisperjav_tpu.version import __version__

RELEASES_URL = ("https://api.github.com/repos/"
                "whisperjav/whisperjav-tpu/releases/latest")


def parse_version(v: str):
    """'v1.3.0rc1' → (1, 3, 0): leading digits of each dot component.

    Pre-release suffixes contribute their numeric prefix (never dropped —
    dropping made 'v1.3.0rc1' parse as (1, 3) and misorder against 1.2.x).
    """
    import re
    parts = []
    for comp in v.strip().lstrip("v").split(".")[:3]:
        m = re.match(r"(\d+)", comp)
        if m is None:
            break
        parts.append(int(m.group(1)))
    return tuple(parts)


def check_latest_version(timeout: float = 5.0) -> Optional[Dict]:
    """Returns {"latest": str, "newer": bool} or None when offline or the
    release tag is unparseable."""
    try:
        with urllib.request.urlopen(RELEASES_URL, timeout=timeout) as r:
            data = json.loads(r.read())
        latest = data.get("tag_name", "")
        if not parse_version(latest):
            return None
        return {
            "latest": latest,
            "newer": parse_version(latest) > parse_version(__version__),
            "url": data.get("html_url"),
        }
    except (urllib.error.URLError, OSError, ValueError, KeyError):
        return None


def upgrade_main() -> int:
    info = check_latest_version()
    if info is None:
        print(f"whisperjav-tpu {__version__} — update check unavailable "
              "(offline)")
        return 0
    if info["newer"]:
        print(f"newer release available: {info['latest']} "
              f"(current {__version__})\n"
              f"upgrade with: pip install -U whisperjav-tpu")
    else:
        print(f"whisperjav-tpu {__version__} is up to date")
    return 0
