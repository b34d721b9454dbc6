"""Mosaic dynamic-gather watch item (BASELINE.md): can Pallas TPU kernels
lower a data-dependent gather yet?

The single-chip step is bound by the XLA gather row path (1.9 ns/row); a
Pallas kernel that fuses the gather with the conv epilogue would break that
floor, but Mosaic has so far refused to lower dynamic indexing. This script
re-checks the three relevant forms each round and prints a dated verdict
line for BASELINE.md.

    python tools/mosaic_gather_check.py
"""

import datetime
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _try(name, kernel, out_shape, *args):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        np.asarray(out)  # force execution
        return name, "LOWERS"
    except Exception as e:  # noqa: BLE001 — report any lowering failure
        msg = str(e).split("\n")[0][:90]
        return name, f"fails ({type(e).__name__}: {msg})"


def main():
    x = jnp.arange(24.0, dtype=jnp.float32).reshape(8, 3)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 8, size=(8,)),
                      jnp.int32)
    out_shape = jax.ShapeDtypeStruct((8, 3), jnp.float32)

    def k_intidx(x_ref, i_ref, o_ref):
        o_ref[...] = x_ref[i_ref[...]]

    def k_take(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], i_ref[...], axis=0)

    def k_tal(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            x_ref[...], i_ref[...][:, None].astype(jnp.int32), axis=0
        )

    results = [
        _try("x[idx] int indexing", k_intidx, out_shape, x, idx),
        _try("jnp.take(axis=0)", k_take, out_shape, x, idx),
        _try("take_along_axis(axis=0)", k_tal, out_shape, x, idx),
    ]
    today = datetime.date.today().isoformat()
    backend = jax.default_backend()
    all_fail = all("fails" in r[1] for r in results)
    for name, verdict in results:
        print(f"  {name}: {verdict}")
    if all_fail:
        print(f"re-checked {today} on jax {jax.__version__} / {backend} — "
              f"dynamic gather still does NOT lower inside Pallas TPU "
              f"kernels; the XLA gather row path floor stands.")
        sys.exit(0)
    print(f"re-checked {today} on jax {jax.__version__} / {backend} — "
          f"SOME dynamic-gather form now lowers! Revisit the fused Pallas "
          f"conv (ops/pallas_conv.py) with an in-kernel gather.")


if __name__ == "__main__":
    main()
