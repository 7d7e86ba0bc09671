"""Minimal repro driver for the compiled-vs-interpret Pallas divergence.
Loads the cached words array; variant controlled by argv."""
import collections
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

words = np.load("/tmp/dbg_words.npy")
Wd = words.shape[1]
U32 = jnp.uint32

PHASES = [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 \
    else list(range(16))


def kern(x_ref, o_ref):
    x = x_ref[:]
    acc = []
    for c in PHASES:
        off = 2 * c - 24 + 2
        jb = off >> 5
        sh = off - 32 * jb
        w1 = pltpu.roll(x, (-(jb + 1)) % Wd, axis=1) if jb + 1 else x
        v = (w1 << U32(32 - sh)) & U32(0xFFFFFF) if sh else w1
        acc.append(v)
    o_ref[:] = jnp.concatenate(acc, axis=1)


outs = {}
for itp in (False, True):
    o = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(words.shape, lambda r: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, Wd * len(PHASES)), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Wd * len(PHASES)), jnp.uint32),
        interpret=itp)(words)
    outs[itp] = np.asarray(o)
d = np.argwhere(outs[False] != outs[True])
print("phases", PHASES, "total diffs:", d.shape[0])
if d.shape[0]:
    cols = d[:, 1]
    print("per-block:", dict(collections.Counter((cols // Wd).tolist())))
    sel = d[(cols // Wd) == (cols[0] // Wd)]
    print("block words:", sorted(set((sel[:, 1] % Wd).tolist()))[:24])
    print("sample:", [(int(r), int(c), hex(outs[False][r, c]),
                       hex(outs[True][r, c])) for r, c in d[:6]])
