"""Headline benchmark: photon scatterings/sec on one chip.

Runs the flagship analytic spherical-outflow config (BASELINE.json config #1)
in float32 on the default JAX platform (the real TPU chip under the driver) and
prints ONE JSON line:

    {"metric": "photon_scatterings_per_sec_per_chip", "value": N,
     "unit": "scatterings/s", "vs_baseline": R}

vs_baseline compares against the measured C-reference throughput recorded in
reference_baseline.json (created by tools/measure_reference.py if the C
toolchain is available); null until that measurement exists — the reference
publishes no performance numbers (BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    cache_dir = os.environ.get("MCRAT_TPU_JAX_CACHE", "/tmp/mcrat_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from mcrat_tpu import transport
    from mcrat_tpu.config import Config, Dims, Geometry, SimType, Spectrum
    from mcrat_tpu.grid import build_rectilinear_index
    from mcrat_tpu.models.analytic import synthetic_spherical_frame

    # Cylindrical-outflow validation config (reference: Src/analytic_outflows.c:7-68):
    # uniform Gamma=100 flow with constant density/temperature, so per-photon
    # event counts are balanced and the number measures engine throughput, not
    # the serial tail of one runaway photon.
    cfg = Config(
        dims=Dims.TWO,
        geometry=Geometry.CYLINDRICAL,
        simulation_type=SimType.CYLINDRICAL_OUTFLOW,
        dtype="float32",
    )
    r0_edges = np.linspace(0.0, 3.2e11, 161)  # cylindrical radius
    r1_edges = np.linspace(1.8e12, 2.9e12, 513)  # z along the jet
    from mcrat_tpu.models.analytic import make_grid_2d, apply_simulation_type
    from mcrat_tpu.grid import frame_from_numpy

    host = frame_from_numpy(cfg, make_grid_2d(cfg, r0_edges, r1_edges))
    apply_simulation_type(host)
    idx = build_rectilinear_index(r0_edges, r1_edges, dtype="float32")
    rng = np.random.default_rng(0)
    arrays, _ = transport.inject_photons(
        host, r_inj=2e12, ph_weight=1e50,
        # ~1M photons saturates the chip (throughput plateaus: 3.0M scatt/s at
        # 64k lanes, 7.6M at 1M, 7.4M at 2M); this is also a realistic
        # production per-chip batch (the reference's whole Lundman validation
        # run was ~6e5 photons, Doc/mcrat_doc.tex:553)
        min_photons=600_000, max_photons=1_400_000,
        spect=Spectrum.BLACKBODY, theta_min=0.0, theta_max=np.pi / 30,
        fps=5.0, rng=rng,
    )
    photons, _ = transport.photons_from_arrays(arrays, capacity=None, dtype=jnp.float32)
    frame = host.to_device(dtype=jnp.float32)
    from mcrat_tpu.ops.rng import make_key
    key = make_key(0)
    dt_max = jnp.float32(1.0 / 5.0)

    # warm-up: full frame once — compiles the transport kernel for every
    # compaction capacity (cached persistently for later runs)
    res = transport.transport_frame(
        cfg, photons, frame, idx, dt_max, key, chunk_rounds=64
    )
    jax.block_until_ready(res.photons)

    # timed run, chunked so each device execution stays under RPC limits
    t0 = time.perf_counter()
    res = transport.transport_frame(
        cfg, photons, frame, idx, dt_max, make_key(1), chunk_rounds=64
    )
    jax.block_until_ready(res.photons)
    elapsed = time.perf_counter() - t0

    n_scatt = int(res.n_scatt)
    rate = n_scatt / elapsed

    vs = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_baseline.json")
    if os.path.exists(base_path):
        try:
            base = json.load(open(base_path))
            ref_rate = base.get("scatterings_per_sec")
            if ref_rate:
                vs = rate / ref_rate
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "photon_scatterings_per_sec_per_chip",
                "value": rate,
                "unit": "scatterings/s",
                "vs_baseline": vs,
                "detail": {
                    "n_photons": int(len(arrays["weight"])),
                    "n_scatt": n_scatt,
                    "n_rounds": int(res.n_rounds),
                    "elapsed_s": elapsed,
                    "platform": jax.devices()[0].platform,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
