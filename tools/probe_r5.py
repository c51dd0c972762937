"""Round-5 measurement probe (one section per child-run argument).

Sections (pass names on argv; default: all):
  gather   — monotonic gather costs (the arb-resampler design question)
  blocks   — farrow/_pfb_block devloop as-is (isolate gather vs dispatch)
  fft      — windowed 4096-pt: jnp.fft vs matmul 4-step (config 2)
  conv     — conv1d_mxu-routed halfband / preamble / cic on chip (r5 fix)

Run on the real TPU under timeout:  python -u tools/probe_r5.py gather
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from solid_dsp_tpu.utils.benchtime import measure_step, measure_apply_devloop
from solid_dsp_tpu.utils.transfer import put_complex


def row(name, t_iter, n=None, unit="ms"):
    r = {"probe": name, "ms": round(t_iter * 1e3, 4)}
    if n:
        r["Msps"] = round(n / t_iter / 1e6, 1)
    print(json.dumps(r), flush=True)


def _chk_step(f, *args):
    @jax.jit
    def g(chk, *a):
        return chk + jnp.sum(jnp.abs(f(*a)).astype(jnp.float32))

    def step(chk):
        c2 = g(chk, *args)
        return c2, c2

    return step


def sec_gather():
    L = 1 << 22
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal(L).astype(np.float32))

    # flat monotonic near-identity gather: y[k] = x[idx[k]], idx sorted
    idx = np.sort(rng.integers(0, L, L)).astype(np.int32)
    idx_d = jax.device_put(idx)
    step = _chk_step(lambda a, i: jnp.take(a, i), x, idx_d)
    r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
    row("gather_flat_4M_from_4M", r["t_iter"], L)

    # row-window gather: (n_out, P) monotonic windows (farrow/pfb shape)
    n_out, P = 1 << 20, 16
    base = np.sort(rng.integers(0, L - P, n_out)).astype(np.int32)
    base_d = jax.device_put(base)

    def win(a, b):
        ii = b[:, None] + jnp.arange(P, dtype=jnp.int32)[None, :]
        return a[ii]

    step = _chk_step(win, x, base_d)
    r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
    row(f"gather_rows_{n_out>>20}M_x{P}", r["t_iter"], n_out)

    # stride-2 slice control (known pathological)
    step = _chk_step(lambda a: a[0::2], x)
    r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
    row("slice_stride2_4M", r["t_iter"], L // 2)

    # dynamic_slice-free reshape control
    step = _chk_step(lambda a: a.reshape(L // 2, 2).sum(-1), x)
    r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
    row("reshape_pairsum_4M", r["t_iter"], L)


def sec_blocks():
    from functools import partial

    from solid_dsp_tpu.ops.farrow import _farrow_block
    from solid_dsp_tpu.ops.resample import PfbArbitraryResampler, _pfb_block

    L = 1 << 22
    x = put_complex((0.1 * np.exp(2j * np.pi * 0.01 * np.arange(L))
                     ).astype(np.complex64))
    ratio = 48000 / 44100
    chunk = 1024
    n_pad = int(np.ceil((L + 3 - 3) / ratio)) + 2
    n_chunks = -(-n_pad // chunk)
    t_c = 0.0 + ratio * chunk * np.arange(n_chunks)
    base0 = jnp.asarray(np.floor(t_c).astype(np.int32))
    frac0 = jnp.asarray((t_c - np.floor(t_c)).astype(np.float32))
    tail = put_complex(np.zeros(3, np.complex64))
    n_valid = n_chunks * chunk

    def fb(tail, x):
        y, t2 = _farrow_block(tail, x, base0, frac0,
                              jnp.asarray(ratio, jnp.float32), n_valid)
        return y, t2

    r = measure_apply_devloop(fb, tail, x, iters=4, ks=(1, 2, 4), reps=2)
    row("farrow_block_4M_devloop", r["t_iter"], L)

    rs = PfbArbitraryResampler(1.0 / 0.37, dtype=jnp.complex64)
    P = rs.P
    print(json.dumps({"probe": "pfb_P", "P": P}), flush=True)
    chunk = max(64, int(1024 / max(rs.ratio, 1.0)))
    lim = L + P - 1 - P + 1
    n_pad = int(np.ceil(lim / rs.ratio)) + 2
    n_chunks = -(-n_pad // chunk)
    t_c = rs.ratio * chunk * np.arange(n_chunks)
    base0 = jnp.asarray(np.floor(t_c).astype(np.int32))
    frac0 = jnp.asarray((t_c - np.floor(t_c)).astype(np.float32))
    tail = put_complex(np.zeros(P - 1, np.complex64))
    table = jnp.asarray(rs._table_np.astype(np.float32))
    kern = partial(_pfb_block, n_valid=n_chunks * chunk, P=P, npf=rs.npf)

    def pb(tail, x):
        y, t2 = kern(tail, x, table, base0, frac0,
                     jnp.asarray(rs.ratio, jnp.float32))
        return y, t2

    r = measure_apply_devloop(pb, tail, x, iters=4, ks=(1, 2, 4), reps=2)
    row("pfb_block_4M_devloop", r["t_iter"], L)


def sec_fft():
    from solid_dsp_tpu.ops.matfft import fft_mx

    F, N = 4096, 4096
    rng = np.random.default_rng(0)
    x = put_complex((rng.standard_normal((F, N))
                     + 1j * rng.standard_normal((F, N))).astype(np.complex64))
    w = np.hamming(N).astype(np.float32)
    flops = F * 5 * N * np.log2(N)

    for name, f in (
        ("fft4096_jnp", lambda a: jnp.fft.fft(
            a * jnp.asarray(w).astype(a.dtype), axis=-1)),
        ("fft4096_mx_x3", lambda a: fft_mx(
            a * jnp.asarray(w).astype(a.dtype), precision="x3")),
        ("fft4096_mx_nowin", lambda a: fft_mx(a, precision="x3")),
        ("fft4096_jnp_nowin", lambda a: jnp.fft.fft(a, axis=-1)),
    ):
        step = _chk_step(f, x)
        r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
        gf = flops / r["t_iter"] / 1e9
        print(json.dumps({"probe": name, "ms": round(r["t_iter"] * 1e3, 3),
                          "GFLOPs": round(gf, 1),
                          "Msps": round(F * N / r["t_iter"] / 1e6, 1)}),
              flush=True)


def sec_conv():
    from solid_dsp_tpu.ops.fir import conv1d_mxu
    from solid_dsp_tpu.ops.halfband import firdes_halfband
    from solid_dsp_tpu.utils import sequences as seq

    L = 1 << 22
    x = put_complex((0.1 * np.exp(2j * np.pi * 0.033 * np.arange(L))
                     ).astype(np.complex64))
    hb = firdes_halfband(8, 60.0).astype(np.float32)
    pad = np.zeros(len(hb) - 1, np.complex64)
    step = _chk_step(
        lambda a: conv1d_mxu(jnp.concatenate([jnp.asarray(pad), a]),
                             jnp.asarray(hb), stride=2), x)
    r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
    row("halfband_conv_toeplitz", r["t_iter"], L)

    p = seq.zadoff_chu(5, 127).astype(np.complex64)
    step = _chk_step(
        lambda a: conv1d_mxu(jnp.concatenate(
            [a, jnp.zeros(126, a.dtype)]), jnp.conj(jnp.asarray(p))), x)
    r = measure_step(step, jnp.zeros(()), ks=(1, 4, 8), reps=2)
    row("preamble_conv_toeplitz_127", r["t_iter"], L)


SECTIONS = {"gather": sec_gather, "blocks": sec_blocks, "fft": sec_fft,
            "conv": sec_conv}


def sec_conv2():
    """Precision/block variants for the long-tap conv (preamble shape)."""
    from solid_dsp_tpu.ops.fir import fir_toeplitz
    from solid_dsp_tpu.utils import sequences as seq

    L = 1 << 22
    x = put_complex((0.1 * np.exp(2j * np.pi * 0.033 * np.arange(L))
                     ).astype(np.complex64))
    p = seq.zadoff_chu(5, 127).astype(np.complex64)
    pc = np.conj(p)
    for prec in ("highest", "x3", "default"):
        for blk in (None, 128, 256, 512):
            step = _chk_step(
                lambda a, _p=prec, _b=blk: fir_toeplitz(
                    jnp.concatenate([a, jnp.zeros(126, a.dtype)]),
                    jnp.asarray(pc), precision=_p, block=_b), x)
            try:
                r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
                row(f"preamble127_{prec}_blk{blk}", r["t_iter"], L)
            except Exception as e:
                print(json.dumps({"probe": f"preamble127_{prec}_blk{blk}",
                                  "error": str(e)[:120]}), flush=True)
    # real-tap control at same length
    hreal = np.ones(127, np.float32) / 127
    step = _chk_step(
        lambda a: fir_toeplitz(jnp.concatenate([a, jnp.zeros(126, a.dtype)]),
                               jnp.asarray(hreal), precision="x3"), x)
    r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
    row("realtaps127_x3", r["t_iter"], L)
    # halfband precision variants
    from solid_dsp_tpu.ops.halfband import firdes_halfband
    hb = firdes_halfband(8, 60.0).astype(np.float32)
    for prec in ("x3", "default"):
        step = _chk_step(
            lambda a, _p=prec: fir_toeplitz(
                jnp.concatenate([jnp.zeros(len(hb) - 1, a.dtype), a]),
                jnp.asarray(hb), stride=2, precision=_p), x)
        r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
        row(f"halfband_{prec}", r["t_iter"], L)


SECTIONS["conv2"] = sec_conv2


def sec_gather2():
    """Contiguous-slice gathers (frame-row extraction for the resampler
    onehot engine) + the batched matvec cost model."""
    rng = np.random.default_rng(0)
    L = 1 << 22
    x = jax.device_put(rng.standard_normal(L).astype(np.float32))

    # static sorted row-index take from a (M, WR) frame matrix
    M, WR = 1 << 14, 464
    C = jax.device_put(rng.standard_normal((M, WR)).astype(np.float32))
    for F_g, tag in ((1 << 14, "16K"), (23000, "23K")):
        idx = np.sort(rng.integers(0, M, F_g)).astype(np.int32)
        idx_d = jax.device_put(idx)
        step = _chk_step(lambda c, i: jnp.take(c, i, axis=0), C, idx_d)
        r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
        row(f"take_rows_{tag}_of_{WR}", r["t_iter"], F_g * WR)

    # flat gather with 256-contiguous slices via lax.gather
    F_g, SL = 23000, 256
    starts = np.sort(rng.integers(0, L - SL, F_g)).astype(np.int32)
    st_d = jax.device_put(starts[:, None])
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
        operand_batching_dims=(), start_indices_batching_dims=())
    step = _chk_step(
        lambda a, s: jax.lax.gather(
            a[None, :].reshape(-1)[: L], s, dn, (SL,),
            mode=jax.lax.GatherScatterMode.CLIP), x, st_d)
    r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
    row(f"gather_slices_{F_g}x{SL}", r["t_iter"], F_g * SL)

    # batched matvec (F, G, W) x (F, W): the onehot-window engine core
    F_b, G, W = 23000, 64, 208
    A = jax.device_put(rng.standard_normal((F_b, G, W)).astype(np.float32))
    V = jax.device_put(rng.standard_normal((F_b, W)).astype(np.float32))

    def mv(a, v):
        return jax.lax.dot_general(
            a, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    step = _chk_step(mv, A, V)
    r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
    row(f"batched_matvec_{F_b}x{G}x{W}", r["t_iter"], F_b * G)

    # onehot build cost: iota-compare over (F*G, W)
    c = jax.device_put(rng.integers(0, W - 16, F_b * G).astype(np.int32))

    def onehot(cc):
        w = jnp.arange(W, dtype=jnp.int32)[None, :]
        return (w == cc[:, None]).astype(jnp.bfloat16)

    step = _chk_step(lambda cc: onehot(cc), c)
    r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
    row(f"onehot_build_{F_b*G}x{W}", r["t_iter"], F_b * G)


SECTIONS["gather2"] = sec_gather2



def sec_take():
    """Row-take scaling at resampler shapes: is take per-element or
    per-row bound?"""
    rng = np.random.default_rng(0)
    L = 1 << 22
    for P in (4, 8, 16):
        C = jax.device_put(rng.standard_normal((L, P)).astype(np.float32))
        n_out = 3 << 20 if P == 4 else 3 << 19
        idx = np.sort(rng.integers(0, L, n_out)).astype(np.int32)
        idx_d = jax.device_put(idx)
        step = _chk_step(lambda c, i: jnp.take(c, i, axis=0), C, idx_d)
        r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
        print(json.dumps({"probe": f"take_rows_{n_out>>20}Mx{P}",
                          "ms": round(r["t_iter"] * 1e3, 3),
                          "Gel_s": round(n_out * P / r["t_iter"] / 1e9, 2)}),
              flush=True)
    # im2col build cost: (L, P) from P shifted slices
    x = jax.device_put(rng.standard_normal(L + 16).astype(np.float32))

    def im2col(a, P=16):
        return jnp.stack([a[i: i + L] for i in range(P)], axis=-1)

    step = _chk_step(im2col, x)
    r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
    row("im2col_build_4Mx16", r["t_iter"], L)


def sec_preamble2():
    """Complex-taps conv after the two-bank fix."""
    from solid_dsp_tpu.ops.fir import fir_toeplitz
    from solid_dsp_tpu.utils import sequences as seq

    L = 1 << 22
    x = put_complex((0.1 * np.exp(2j * np.pi * 0.033 * np.arange(L))
                     ).astype(np.complex64))
    p = np.conj(seq.zadoff_chu(5, 127).astype(np.complex64))
    for prec in ("highest", "x3"):
        step = _chk_step(
            lambda a, _p=prec: fir_toeplitz(
                jnp.concatenate([a, jnp.zeros(126, a.dtype)]),
                jnp.asarray(p), precision=_p), x)
        r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
        row(f"preamble127_2bank_{prec}", r["t_iter"], L)


def sec_pfft():
    """Fused windowed-FFT kernel compiled on chip."""
    from solid_dsp_tpu.ops.pallas_fft import make_fused_windowed_fft

    F, N = 4096, 4096
    rng = np.random.default_rng(0)
    sig = (rng.standard_normal((F, N))
           + 1j * rng.standard_normal((F, N))).astype(np.complex64)
    x2 = jax.device_put(np.stack([sig.real, sig.imag]).astype(np.float32))
    w = np.hamming(N).astype(np.float32)
    flops = F * 5 * N * np.log2(N)
    for mode in ("x3", "fast"):
        for TF in (8, 16, 32):
            try:
                apply = make_fused_windowed_fft(N, F, window=w, TF=TF,
                                                mode=mode)
                step = _chk_step(apply, x2)
                r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=1)
                print(json.dumps(
                    {"probe": f"pfft4096_{mode}_TF{TF}",
                     "ms": round(r["t_iter"] * 1e3, 3),
                     "GFLOPs": round(flops / r["t_iter"] / 1e9, 1)}),
                    flush=True)
            except Exception as e:
                print(json.dumps({"probe": f"pfft4096_{mode}_TF{TF}",
                                  "error": str(e)[:160]}), flush=True)


SECTIONS["take"] = sec_take
SECTIONS["preamble2"] = sec_preamble2
SECTIONS["pfft"] = sec_pfft



def sec_stream():
    """Decompose the 13x stream-scan collapse (VERDICT weak #2):
    per-dispatch vs scan, precision, block count, ingest format."""
    from solid_dsp_tpu.models.rx_chain import (RxChainConfig, make_rx_chain,
                                               make_rx_chain_stream)

    L = 1 << 23
    x_np = (0.1 * np.exp(2j * np.pi * 0.033 * np.arange(L))
            ).astype(np.complex64)
    x = put_complex(x_np)

    def mk(prec):
        return RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                             agc_mode="block", demod="fm", nco_mode="exact",
                             fir_precision=prec, dtype=jnp.complex64)

    # (a) per-dispatch block mode, highest precision (stream's config)
    for prec in ("highest", "x3"):
        init, apply = make_rx_chain(mk(prec))
        st = apply and init()
        r = measure_apply_devloop(apply, st, x, iters=8, ks=(1, 2, 4),
                                  reps=2)
        row(f"blockmode_cf32_{prec}_8M", r["t_iter"], L)

    # (b) stream scan over NB blocks
    for prec in ("highest", "x3"):
        for NB in (2, 8):
            init, apply_s = make_rx_chain_stream(mk(prec), L // NB)
            st = init()

            @jax.jit
            def g(chk, st, xs):
                out, st2 = apply_s(st, xs)
                return chk + jnp.sum(out), st2

            def step(carry):
                chk, st = carry
                c2, st2 = g(chk, st, x)
                return c2, (c2, st2)

            r = measure_step(step, (jnp.zeros(()), st), ks=(1, 2, 4),
                             reps=2)
            row(f"stream_{prec}_NB{NB}_8M", r["t_iter"], L)


def sec_parity():
    """Decompose the parity chain (235 Ms/s in r04): which stage binds?"""
    from solid_dsp_tpu.models.rx_chain import RxChainConfig, make_rx_chain
    from solid_dsp_tpu.ops import agc as agc_ops
    from solid_dsp_tpu.ops import nco as nco_ops

    L = 1 << 23
    x_np = (0.1 * np.exp(2j * np.pi * 0.033 * np.arange(L))
            ).astype(np.complex64)
    x = put_complex(x_np)
    lut = nco_ops.make_sine_lut(np.float32)

    # (1) LUT-quantized NCO mix alone at full rate
    @jax.jit
    def g_mix(chk, x):
        y, _ = nco_ops.mix_down_block(x, jnp.uint32(0),
                                      nco_ops.constrain(0.2), lut, "lut")
        return chk + jnp.sum(jnp.abs(jnp.real(y)))

    def step(chk):
        c2 = g_mix(chk, x)
        return c2, c2

    r = measure_step(step, jnp.zeros(()), ks=(1, 2, 4), reps=2)
    row("parity_lut_mix_8M", r["t_iter"], L)

    # (2) parallel (Newton/DEER) AGC alone at the decimated rate
    Td = L // 4
    yd = put_complex((0.2 * np.exp(2j * np.pi * 0.01 * np.arange(Td))
                      ).astype(np.complex64))
    st0 = agc_ops.agc_init(np.float32)

    def agc_apply(st, y):
        out, st2 = agc_ops.agc_apply_parallel(st, y, 0.01, 1.0, -1e30, 100)
        return out, st2

    r = measure_apply_devloop(agc_apply, st0, yd, iters=4, ks=(1, 2, 4),
                              reps=2)
    row("parity_agc_parallel_2M_dec", r["t_iter"] * 4, L)

    # (3) full parity chain (the committed row's config)
    cfg = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                        agc_mode="parallel", nco_mode="lut", demod="fm",
                        dtype=jnp.complex64)
    init, apply = make_rx_chain(cfg)
    st = init()
    r = measure_apply_devloop(apply, st, x, iters=4, ks=(1, 2, 4), reps=2)
    row("parity_chain_8M", r["t_iter"], L)

    # (4) parity chain minus the AGC (block agc, LUT nco)
    cfg2 = RxChainConfig(carrier_freq=0.2, decimation=4, fir_taps=64,
                         agc_mode="block", nco_mode="lut", demod="fm",
                         dtype=jnp.complex64)
    init2, apply2 = make_rx_chain(cfg2)
    r = measure_apply_devloop(apply2, init2(), x, iters=4, ks=(1, 2, 4),
                              reps=2)
    row("parity_lutnco_blockagc_8M", r["t_iter"], L)


SECTIONS["stream"] = sec_stream
SECTIONS["parity"] = sec_parity

if __name__ == "__main__":
    picks = sys.argv[1:] or list(SECTIONS)
    for name in picks:
        try:
            SECTIONS[name]()
        except Exception as e:
            print(json.dumps({"probe": name, "error": str(e)[:200]}),
                  flush=True)
