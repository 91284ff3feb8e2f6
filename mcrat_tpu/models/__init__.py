"""Problem/model families.

- :mod:`.analytic` — the reference's three analytic validation outflows
  (Src/analytic_outflows.c) as first-class synthetic backends that need no
  hydro data files.
"""

from . import analytic  # noqa: F401
