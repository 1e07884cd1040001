"""User-facing error types.

``InputError`` marks problems with the user's input files (empty or
malformed FastQ, impossible flag/input combinations) — the CLI turns
these, plus OS-level and gzip decode errors, into a clean one-line
diagnostic.  Internal errors deliberately keep their tracebacks.
"""


class InputError(ValueError):
    """The input files (not the tool) are at fault."""
