"""ERA5/CF-convention forcing reader tests.

A synthetic CDS-style file is written with h5py: hours-since-1900 time,
descending latitudes, int16 CF packing (scale_factor/add_offset/_FillValue)
— the reader must decode packing, convert units (K->degC, accumulated
J m-2 -> W m-2, m w.e. -> kg m-2 s-1), regrid bilinearly onto the model
mesh, and feed the standard ForcingProvider chain.
"""

import h5py
import numpy as np
import pytest

from nextsimdg_tpu.io.era5 import (
    ERA5Dataset,
    era5_to_archive,
    lonlat_box,
    regrid_bilinear,
)
from nextsimdg_tpu.io.forcing_file import ForcingProvider

NLAT, NLON, NT = 9, 12, 4
LATS = np.linspace(80.0, 70.0, NLAT)  # descending, ERA5-style
LONS = np.linspace(10.0, 32.0, NLON)


def _pack(values, scale, offset, fill=-32767):
    """CF int16 packing with a masked cell."""
    raw = np.round((values - offset) / scale).astype(np.int16)
    return raw, fill


def _write_era5(path, mask_cell=None):
    t2m = np.empty((NT, NLAT, NLON))
    u10 = np.empty_like(t2m)
    v10 = np.empty_like(t2m)
    ssrd = np.empty_like(t2m)
    sf = np.empty_like(t2m)
    lat2, lon2 = np.meshgrid(LATS, LONS, indexing="ij")
    for t in range(NT):
        t2m[t] = 250.0 + 0.1 * t + 0.2 * (lat2 - 70.0) + 0.05 * (lon2 - 10.0)
        u10[t] = 5.0 + 0.01 * lon2
        v10[t] = -2.0 + 0.02 * lat2
        ssrd[t] = 3600.0 * (50.0 + t)  # J m-2 over 1 h -> (50+t) W m-2
        sf[t] = 3600.0 * 1e-7  # m w.e. per hour
    with h5py.File(path, "w") as f:
        time = f.create_dataset(
            "time", data=np.arange(NT, dtype=np.int32) + 1_000_000
        )
        time.attrs["units"] = np.bytes_("hours since 1900-01-01 00:00:00.0")
        f.create_dataset("latitude", data=LATS)
        f.create_dataset("longitude", data=LONS)

        def packed(name, values, scale, offset):
            raw, fill = _pack(values, scale, offset)
            if mask_cell is not None and name == "t2m":
                raw[(slice(None),) + mask_cell] = fill
            d = f.create_dataset(name, data=raw)
            d.attrs["scale_factor"] = np.float64(scale)
            d.attrs["add_offset"] = np.float64(offset)
            d.attrs["_FillValue"] = np.int16(fill)

        packed("t2m", t2m, 1e-3, 260.0)
        packed("u10", u10, 1e-4, 5.0)
        packed("v10", v10, 1e-4, -2.0)
        f.create_dataset("ssrd", data=ssrd)  # unpacked f64 variant
        f.create_dataset("sf", data=sf)
    return dict(t2m=t2m, u10=u10, v10=v10, ssrd=ssrd, sf=sf)


def test_era5_decode_units_and_packing(tmp_path):
    path = str(tmp_path / "era5.nc")
    truth = _write_era5(path)
    ds = ERA5Dataset(path)

    # time: hours since -> seconds relative to first record.
    np.testing.assert_allclose(ds.time, 3600.0 * np.arange(NT))
    # t2m: unpack + K->degC (packing quantizes at 1e-3).
    np.testing.assert_allclose(
        ds.fields["tair"], truth["t2m"] - 273.15, atol=1e-3
    )
    # accumulated SW: J m-2 over the 1 h step -> W m-2.
    np.testing.assert_allclose(ds.fields["sw_in"][2], 52.0)
    # snowfall: m w.e./h -> kg m-2 s-1.
    np.testing.assert_allclose(ds.fields["snowfall"], 1e-4, rtol=1e-12)
    # wind speed derived from components.
    np.testing.assert_allclose(
        ds.fields["wind"], np.hypot(truth["u10"], truth["v10"]), atol=1e-3
    )


def test_regrid_bilinear_exact_for_linear_fields():
    lat2, lon2 = np.meshgrid(LATS, LONS, indexing="ij")
    field = 2.0 * lat2 + 3.0 * lon2  # bilinear regrid is exact on linears
    dst_lats, dst_lons = lonlat_box(6, 5, 71.0, 79.0, 11.0, 31.0)
    out = regrid_bilinear(field, LATS, LONS, dst_lats, dst_lons)
    np.testing.assert_allclose(out, 2.0 * dst_lats + 3.0 * dst_lons, rtol=1e-12)


def test_regrid_fills_masked_cells(tmp_path):
    path = str(tmp_path / "era5_masked.nc")
    _write_era5(path, mask_cell=(4, 6))
    ds = ERA5Dataset(path)
    assert np.isnan(ds.fields["tair"][0, 4, 6])  # fill -> NaN on decode
    dst_lats, dst_lons = lonlat_box(8, 8, 71.0, 79.0, 11.0, 31.0)
    out = regrid_bilinear(ds.fields["tair"], ds.lats, ds.lons, dst_lats, dst_lons)
    assert np.all(np.isfinite(out))  # nearest-fill before interpolation


def test_era5_to_archive_feeds_forcing_provider(tmp_path):
    era5_path = str(tmp_path / "era5.nc")
    archive_path = str(tmp_path / "forcing.h5")
    _write_era5(era5_path)
    nx, ny = 6, 5
    dst_lats, dst_lons = lonlat_box(nx, ny, 71.0, 79.0, 11.0, 31.0)
    ocean = np.full((NT, nx, ny), 0.05)
    era5_to_archive(
        era5_path, archive_path, dst_lats, dst_lons,
        extra_fields={"u_ocean": ocean}, mld=15.0,
    )

    provider = ForcingProvider(archive_path)
    forcing = provider.thermo_forcing(1800.0, nx, ny)  # halfway step 0->1
    assert forcing.tair.shape == (nx, ny)
    # t2m is linear in lat/lon and +0.1 K per step: check the interpolated
    # mean in time at a probed element.
    expected = (
        250.0 + 0.05  # half a time step
        + 0.2 * (dst_lats[2, 3] - 70.0) + 0.05 * (dst_lons[2, 3] - 10.0)
        - 273.15
    )
    np.testing.assert_allclose(float(forcing.tair[2, 3]), expected, atol=2e-3)
    np.testing.assert_allclose(float(forcing.mld[0, 0]), 15.0)

    dyn = provider.dynamics_forcing(0.0, nx, ny)
    np.testing.assert_allclose(np.asarray(dyn.u_ocean), 0.05)

    # Mismatched extra-field shape is rejected.
    with pytest.raises(ValueError):
        era5_to_archive(
            era5_path, archive_path, dst_lats, dst_lons,
            extra_fields={"u_ocean": ocean[:, :2]},
        )
