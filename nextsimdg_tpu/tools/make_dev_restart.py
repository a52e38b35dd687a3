"""Generate the canonical development restart file.

Equivalent of the reference's ``run/dev_res.py``: a 10x10 devgrid restart
with cice=0.5, hice=0.1, hsnow=0, sss=32, sst=-1, tice=-1 (1 layer).

Usage: ``python -m nextsimdg_tpu.tools.make_dev_restart [path]``
"""

from __future__ import annotations

import sys

import numpy as np

from ..io.restart import write_restart


def make_dev_restart(path: str = "dev1.res.nc", nx: int = 10, ny: int = 10) -> None:
    full = lambda v: np.full((nx, ny), v, dtype=np.float64)
    write_restart(
        path,
        "devgrid",
        {
            "cice": full(0.5),
            "hice": full(0.1),
            "hsnow": full(0.0),
            "sss": full(32.0),
            "sst": full(-1.0),
        },
        np.full((nx, ny, 1), -1.0, dtype=np.float64),
    )


if __name__ == "__main__":
    make_dev_restart(sys.argv[1] if len(sys.argv) > 1 else "dev1.res.nc")
