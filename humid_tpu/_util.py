"""Small shared host utilities."""

from __future__ import annotations

import os


def avail_bytes(default: int = 1 << 33) -> int:
    """Available physical memory in bytes (``default`` when the sysconf
    probe is unsupported).  Single definition so a future cgroup-aware
    fix lands everywhere at once."""
    try:
        return os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError):
        return default
