"""Round-5 probe #4 (v2): per-primitive cost measurement, fold-proof.

Every loop body is serialized through the carried accumulator (and/or a
VMEM ref), so Mosaic cannot hoist or fold iterations. Composite cases
mimic the trace kernel's cluster gate exactly; differences between
variants isolate the cost of each ingredient:

  gate_full    slab(6 SMEM scalars) + max-reduce + pl.when(ref write)
  gate_nowhen  slab + max-reduce (no branch)
  gate_nored   slab only (vector result folded into acc)
  reduce_rt    vector->scalar->vector round trip alone
  when_rt      scalar-pred pl.when alone
  sweep16      16-triangle MT sweep (the known-cheap baseline)
  fori_chain   scalar-arith fori (loop overhead floor)
  dynread7     7 dynamic-major (8,128) VMEM reads, serialized
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build(prim: str, n_iter: int):
    def kernel(x_ref, o_ref, buf, wc, wsm):
        x = x_ref[0]                                  # (8,128)
        # init SMEM box table + VMEM chord table from the input so
        # nothing is a compile-time constant
        for k in range(32):
            for c in range(3):
                wsm[k, c] = x[0, 0] * 0.1 - 1.0 - 0.01 * k
                wsm[k, c + 3] = x[0, 0] * 0.1 + 1.0 + 0.01 * k
        buf[0] = x

        def slab(k, px, py, pz):
            ix = pl.reciprocal(px, approx=True)
            iy = pl.reciprocal(py, approx=True)
            iz = pl.reciprocal(pz, approx=True)
            tx0 = (wsm[k, 0] - px) * ix
            tx1 = (wsm[k, 3] - px) * ix
            ty0 = (wsm[k, 1] - py) * iy
            ty1 = (wsm[k, 4] - py) * iy
            tz0 = (wsm[k, 2] - pz) * iz
            tz1 = (wsm[k, 5] - pz) * iz
            tmn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                          jnp.minimum(ty0, ty1)),
                              jnp.minimum(tz0, tz1))
            tmx = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            return (tmn <= tmx) & (tmx >= 0.0)

        if prim in ("gate_full", "gate_nowhen", "gate_nored"):
            def body(i, acc):
                r = slab(i % 32, acc, acc + 0.5, acc + 1.0)
                if prim == "gate_nored":
                    return acc * 0.9999 + r.astype(jnp.float32)
                pred = jnp.max(r.astype(jnp.float32)) > 0.0
                if prim == "gate_nowhen":
                    return acc * 0.9999 + jnp.where(pred, 0.001, 0.002)

                @pl.when(pred)
                def _():
                    buf[0] = buf[0] * 0.9999 + 0.001
                return acc * 0.9999 + 0.0001
            out = jax.lax.fori_loop(0, n_iter, body, x)
            o_ref[0] = out + buf[0]
        elif prim == "reduce_rt":
            def body(i, acc):
                s = jnp.max(acc)
                return acc * 0.9999 + s * 1e-6
            out = jax.lax.fori_loop(0, n_iter, body, x)
            o_ref[0] = out
        elif prim == "when_rt":
            def body(i, acc):
                @pl.when(acc % 3 == 0)
                def _():
                    buf[0] = buf[0] * 0.9999 + 0.001
                return acc * 7 % 1001
            jax.lax.fori_loop(0, n_iter, body, jnp.int32(3))
            o_ref[0] = buf[0]
        elif prim == "sweep16":
            def body(i, acc):
                bt = acc
                for t in range(16):
                    f = wsm[t, 0]
                    sx = acc - f
                    sy = acc - f - 1.0
                    sz = acc - f - 2.0
                    s1x = sy * 2.0 - sz
                    s1y = sz * 2.0 - sx
                    s1z = sx * 2.0 - sy
                    den = s1x + s1y * 2.0 + s1z
                    inv = pl.reciprocal(jnp.where(den != 0.0, den, 1.0),
                                        approx=True)
                    tt = (s1x * sx + s1y * sy + s1z * sz) * inv
                    ok = (tt >= 0.0) & (tt <= 10.0) & (den != 0.0)
                    tm = jnp.where(ok, tt, 3e37)
                    bt = jnp.minimum(bt, tm)
                return bt * 0.999 + 0.01
            out = jax.lax.fori_loop(0, n_iter, body, x)
            o_ref[0] = out
        elif prim == "fori_chain":
            def body(i, acc):
                return acc * 7 % 1001 + i % 3
            out = jax.lax.fori_loop(0, n_iter, body, jnp.int32(3))
            o_ref[0] = jnp.full((8, 128), out, jnp.float32)
        elif prim == "dynread7":
            def body(i, acc):
                w = i % 8
                for c in range(7):
                    acc = acc * 0.9999 + wc[w, c]
                return acc
            out = jax.lax.fori_loop(0, n_iter, body, x)
            o_ref[0] = out
        else:
            raise ValueError(prim)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 8, 128), jnp.float32),
                        pltpu.VMEM((8, 7, 8, 128), jnp.float32),
                        pltpu.SMEM((32, 8), jnp.float32)],
    )


def main():
    x = jnp.ones((1, 8, 128), jnp.float32) * 1.5
    prims = ["gate_full", "gate_nowhen", "gate_nored", "reduce_rt",
             "when_rt", "sweep16", "fori_chain", "dynread7"]
    N1, N2 = 20000, 100000
    for prim in prims:
        try:
            ts = {}
            for N in (N1, N2):
                f = jax.jit(build(prim, N))
                out = f(x)
                jax.block_until_ready(out)
                t0 = time.time()
                for _ in range(5):
                    out = f(x)
                jax.block_until_ready(out)
                ts[N] = (time.time() - t0) / 5
            per = (ts[N2] - ts[N1]) / (N2 - N1)
            print(f"{prim:12s}: {per*1e9:8.2f} ns/iter "
                  f"(~{per*1.75e9:7.1f} cy)  [t{N1}={ts[N1]*1e3:.2f}ms "
                  f"t{N2}={ts[N2]*1e3:.2f}ms]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{prim}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
