"""On-chip flash-kernel block-size sweep at long T (round-5 VERDICT #1).

Isolated fwd / fwd+bwd microbenches of ops/pallas_attention at
T in {2048, 4096}, base-arch head shapes (H=12, D=64), sweeping
(block_q, block_k) and the causal DMA clamp. Tunnel discipline per
CLAUDE.md: scan-chain x N iters, timing ends in a scalar readback, measured
RTT subtracted, N large enough that N*t >> RTT.

Run ON THE REAL CHIP (one TPU process at a time):
    timeout 3600 python tools/kb_flash_longT.py 2048
    timeout 5400 python tools/kb_flash_longT.py 4096
"""
import functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from ofasys_tpu.ops import pallas_attention as pa

N_ITER = int(os.environ.get("KB_N", "50"))
RTT = None


def measure_rtt():
    global RTT
    g0 = jax.jit(lambda x: x + 1.0)
    _ = float(g0(jnp.float32(0)))
    rs = []
    for i in range(20):
        t0 = time.perf_counter()
        _ = float(g0(jnp.float32(i)))
        rs.append(time.perf_counter() - t0)
    RTT = float(np.median(rs))
    print(f"RTT {RTT*1000:.1f} ms", flush=True)


def timeit(name, f, x0, *rest):
    """f(carry_like_x0, *rest) -> array reduced into the carry."""
    def chain(carry, _):
        out = f(carry, *rest)
        return carry + out * jnp.bfloat16(1e-8), ()

    def run(x):
        c, _ = jax.lax.scan(chain, x, None, length=N_ITER)
        return jnp.sum(c.astype(jnp.float32))

    r = jax.jit(run)
    try:
        t0 = time.perf_counter()
        _ = float(r(x0))
        cs = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:44s} FAILED: {repr(e)[:110]}", flush=True)
        return None
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(r(x0))
        best = min(best, time.perf_counter() - t0)
    v = (best - RTT) / N_ITER * 1000
    print(f"{name:44s} {v:8.3f} ms/iter  (compile {cs:.0f}s)", flush=True)
    return v


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    B = 2 if T <= 4096 else 1
    H, D = 12, 64
    BH = B * H
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, T, D)), jnp.bfloat16)
    mask = jnp.ones((BH, 1, T), jnp.int8)
    scale = float(D * 2) ** -0.5
    measure_rtt()
    flops_fwd = 4 * BH * T * T * D
    print(f"== T={T} B={B} BH={BH}: fwd dot-FLOPs {flops_fwd/1e9:.1f} GF "
          f"(causal ~half), v5e bf16 peak 394 TF/s", flush=True)

    blocks = [(512, 512), (512, 1024), (1024, 1024),
              (512, 2048), (1024, 2048), (2048, 2048)]

    for causal in (False, True):
        tag = "causal" if causal else "full  "
        for (bq, bk) in blocks:
            if bq > T or bk > T:
                continue

            def fwd(qq, bq=bq, bk=bk, causal=causal):
                return pa._flash_forward(qq, k, v, None, mask, scale, causal,
                                         block_q=bq, block_k=bk)

            timeit(f"fwd  {tag} Bq={bq:4d} Bk={bk:4d}", fwd, q)

    # fwd+bwd through the custom vjp (block sizes via env for the bwd path)
    for causal in (False, True):
        tag = "causal" if causal else "full  "
        for (bq, bk) in blocks:
            if bq > T or bk > T:
                continue
            os.environ["OFASYS_FLASH_BQ"] = str(bq)
            os.environ["OFASYS_FLASH_BK"] = str(bk)
            os.environ["OFASYS_FLASH_BQ_BWD"] = str(bq)
            os.environ["OFASYS_FLASH_BK_BWD"] = str(bk)

            def fb(qq, causal=causal):
                def loss(qx):
                    o = pa.flash_attention_flat(qx, k, v, None, mask, scale, causal)
                    return jnp.sum(o.astype(jnp.float32))
                return jax.grad(loss)(qq)

            timeit(f"f+b  {tag} Bq={bq:4d} Bk={bk:4d}", fb, q)
    for e in ("OFASYS_FLASH_BQ", "OFASYS_FLASH_BK",
              "OFASYS_FLASH_BQ_BWD", "OFASYS_FLASH_BK_BWD"):
        os.environ.pop(e, None)


if __name__ == "__main__":
    main()
