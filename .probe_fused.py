import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from c_lwe_snarks_tpu.ops import sampling, eval_fused
from c_lwe_snarks_tpu.utils import params as params_mod
import sys
d = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
P = params_mod.custom(d=d, m=16)
key = sampling.PRGKey(bytes(range(40,80)))
rng = np.random.default_rng(0)
c = jnp.asarray(rng.integers(0,P.p,size=(2,d),dtype=np.uint32))
f = jax.jit(lambda c: eval_fused.eval_mac_planes(key, 0, c, P.n, P.ctr_ct))
t0=time.perf_counter(); lowered = f.lower(c); print('lower', time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); compiled = lowered.compile(); print('compile', time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); r = jax.block_until_ready(compiled(c)); print('run1', time.perf_counter()-t0, flush=True)
t0=time.perf_counter(); jax.block_until_ready(compiled(c)); print('run2', time.perf_counter()-t0, flush=True)
print('sum', int(np.asarray(r, dtype=np.int64).sum()), flush=True)
