import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
T = 16
table = jnp.asarray(np.arange(T*128).reshape(T,128).astype(np.float32))
idx = jnp.asarray(rng.integers(0, T, (8,128)).astype(np.int32))

def k(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

out = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(table, idx)
got = np.asarray(out)
exp = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
print("match:", np.array_equal(got, exp))
if not np.array_equal(got, exp):
    bad = np.argwhere(got != exp)
    print("num mismatch:", len(bad), "/", got.size)
    r, c = bad[0]
    print("first bad at", r, c, "idx=", np.asarray(idx)[r,c], "got", got[r,c], "exp", exp[r,c])
    # hypothesis: gather uses only idx row 0? or transposed?
    exp2 = np.asarray(table)[np.asarray(idx)[:, 0]]  # row-indexed by lane0
    print("row-by-lane0 match:", np.array_equal(got, exp2))
