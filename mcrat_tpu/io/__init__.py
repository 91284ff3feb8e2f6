"""Host I/O: hydro frame readers, runtime parameters, photon output, checkpoints.

Component map (reference equivalents):

- :mod:`.mcpar` — mc.par parse/write (Src/mcrat_io.c:1136-1237)
- :mod:`.flash` — FLASH 2-D AMR HDF5 (Src/mclib_flash.c)
- :mod:`.pluto` — PLUTO .dbl / grid.out / dbl.out (Src/mclib_pluto.c:852-1459)
- :mod:`.pluto_chombo` — PLUTO-Chombo AMR HDF5 (Src/mclib_pluto.c:12-801)
- :mod:`.riken` — RIKEN legacy Fortran binaries (Src/mclib_riken.c)
- :mod:`.decimate` — shared photon-band frame decimation
- :mod:`.hydro` — getHydroData dispatch (Src/mcrat_io.c:1898-1990)
- :mod:`.photons_h5` — per-rank dumps + merge, ProcessMCRaT schema
  (Src/mcrat_io.c:114-836, 1239-1772; Src/merge.c)
- :mod:`.checkpoint` — checkpoint/resume/elastic restart
  (Src/mcrat_io.c:838-1134, Src/mcrat.c:166-448)
"""

from . import checkpoint, decimate, hydro, mcpar, photons_h5  # noqa: F401
