import sys, jax, jax.numpy as jnp, numpy as np
from solid_dsp_tpu.models.rx_chain import RxChainConfig, rx_chain_init
from solid_dsp_tpu.utils.transfer import put_complex

def chk(tag):
    print(tag, float(jax.jit(lambda: jnp.sum(jnp.arange(8.0)))()))

chk('start')
L = 1<<14
x = put_complex((0.1*np.exp(2j*np.pi*0.033*np.arange(L))).astype(np.complex64))
chk('after put_complex')
cfg = RxChainConfig(dtype=jnp.complex64)
st = rx_chain_init(cfg)
chk('after init')
for name in st.__dataclass_fields__ if hasattr(st,'__dataclass_fields__') else []:
    pass
leaves = jax.tree_util.tree_leaves(st)
for i, l in enumerate(leaves):
    try:
        jax.block_until_ready(l)
        print('leaf', i, l.dtype, l.shape, 'ready')
    except Exception as e:
        print('leaf', i, 'FAIL', str(e)[:50])
chk('after leaves')
