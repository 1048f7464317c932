import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from qcnn_gpu_tpu.ops import pallas_pipeline as PP
from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames

p = synth_engine_params(37)
B, H, W = 4, 1080, 1920
xb = jax.device_put(synth_frames(B, H, W, seed=2))

def bench(f, *a, n=12):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n): o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1000 / B

for th in (8, 16, 32):
    try:
        run = PP.build_pallas_forward(p, th=th)
        t = bench(run, xb)
        print(f"th={th}: {t:.2f} ms/frame ({1000/t:.0f} fps)", flush=True)
    except Exception as e:
        print(f"th={th}: FAIL {str(e)[:200]}", flush=True)

# prep-only: the XLA-side window + im2col for th=16
th, we = 16, 256
tw = we - PP.PAD
he = th + PP.PAD
m1 = (th + 8) * we

@jax.jit
def prep(x_uint8):
    b, h, w = x_uint8.shape
    nh = -(-h // th); nw = -(-w // tw)
    hp, wp = nh * th, nw * tw
    x = x_uint8.astype(jnp.int32) - 128
    xp = jnp.pad(x, ((0, 0), (PP.HALO, PP.HALO + hp - h), (PP.HALO, PP.HALO + wp - w)))
    xw = PP._window(xp, th, tw, he, we, nh, nw)
    flat = jnp.pad(xw.reshape(b, nh, nw, he * we).astype(jnp.bfloat16),
                   ((0,0),(0,0),(0,0),(0,8)))
    taps = [flat[..., dy*we+dx : dy*we+dx+m1] for dy in range(5) for dx in range(5)]
    a1t = jnp.stack(taps, axis=3)
    return jnp.pad(a1t, ((0,0),(0,0),(0,0),(0,7),(0,0)))

print("prep-only th=16: %.2f ms/frame" % bench(prep, xb), flush=True)
