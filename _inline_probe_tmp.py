import time, jax
jax.config.update('jax_compilation_cache_dir', '/tmp/fp8tpu_jax_cache')
import jax.numpy as jnp
print('importing pkg', flush=True)
from fp8_quantization_tpu.ops.fp8 import quantize_to_fp8
from fp8_quantization_tpu.ops.s2d import s2d_stem_kernel, space_to_depth
print('imports ok', flush=True)
x = jax.random.normal(jax.random.PRNGKey(0), (512,224,224,3)).astype(jnp.bfloat16)
w = (jax.random.normal(jax.random.PRNGKey(1), (7,7,3,64))*0.1).astype(jnp.bfloat16)
w2, s2, p2 = s2d_stem_kernel(w)
print('w2 ready', flush=True)
x_s2d = space_to_depth(x)
print('x_s2d ready', flush=True)
def epi(y): return quantize_to_fp8(jax.nn.relu(y), jnp.asarray(6.0), 4.0)
f1 = jax.jit(lambda x: epi(jax.lax.conv_general_dilated(x, w, (2,2), ((3,3),(3,3)), dimension_numbers=('NHWC','HWIO','NHWC'), preferred_element_type=jnp.float32)))
t0=time.time(); f1(x).block_until_ready(); print('conv7+epi compile+run', time.time()-t0, flush=True)
f3 = jax.jit(lambda xs: epi(jax.lax.conv_general_dilated(xs, w2, s2, p2, dimension_numbers=('NHWC','HWIO','NHWC'), preferred_element_type=jnp.float32)))
t0=time.time(); f3(x_s2d).block_until_ready(); print('s2d_input compile+run', time.time()-t0, flush=True)
def bench(fn, arg, iters=20):
    best=1e9
    for _ in range(3):
        t0=time.time()
        for _ in range(iters): out=fn(arg)
        out.block_until_ready(); best=min(best,(time.time()-t0)/iters)
    return best
print('conv7x7+epi', bench(f1,x)*1e3, 'ms', flush=True)
print('s2d_input+epi', bench(f3,x_s2d)*1e3, 'ms', flush=True)
