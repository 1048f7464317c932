import sys, time
sys.path.insert(0, "/root/repo")
print('start', flush=True)
import numpy as np, jax
from qcnn_gpu_tpu.ops.pallas_pipeline import build_pallas_forward
from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames
p = synth_engine_params(37)
run = build_pallas_forward(p)
x = synth_frames(1, 48, 488, seed=1)
t0=time.perf_counter()
got = np.asarray(run(x))
print('small compile+run %.1fs; bit-exact: %s'%(time.perf_counter()-t0, (got==O.forward_blu(x,p)).all()), flush=True)
xb = jax.device_put(synth_frames(4, 1080, 1920, seed=2))
t0=time.perf_counter()
out = run(xb); out.block_until_ready()
print('1080p compile %.1fs'%(time.perf_counter()-t0), flush=True)
t0=time.perf_counter(); n=16
for _ in range(n): out = run(xb)
out.block_until_ready()
dt=time.perf_counter()-t0
print('pallas 1080p: %.2f ms/frame (%.1f fps)'%(1000*dt/(n*4), n*4/dt), flush=True)
