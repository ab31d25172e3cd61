"""Re-attention (DeepViT-style) with conv-QKV in patch space, TPU-native.

Reference behaviour (``torch/model.py:113-164`` / ``tf/functions.py:185-254``):
Q/K/V are produced by per-patch CxC convolutions on the *image form* of each
token, attention is standard scaled-dot-softmax, and a learned 1x1 convolution
across heads followed by BatchNorm re-mixes the attention maps before they
multiply V.  The reference loops over the batch in Python for the convs (its
#1 perf bug, SURVEY.md §7); here the conv runs once over a fused (B*N) batch
and everything stays inside one jitted graph.

An optional fused Pallas path (``vit_unet_tpu.kernels``) computes the same
function without materialising the (N, N) attention matrix in HBM; it is
numerically validated against this XLA path in tests.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_unet_tpu.ops.patches import unflatten, unflatten_cl


def conv_tokens(x: jnp.ndarray, conv: Callable, num_channels: int,
                layout: str = "cm") -> jnp.ndarray:
    """Apply a CxC conv to every token's (C, p, p) patch image.

    x: (B, N, C*p*p) tokens -> same shape.  ``layout='cm'`` treats the token
    vector as channel-major (torch flavour); ``'cl'`` as channels-last (TF
    flavour, ``tf/functions.py:224-238``).  The conv is a flax module
    expecting NHWC; tokens are folded into the conv batch so one conv call
    covers (B*N) patches (vs the reference's per-sample Python loop at
    ``torch/model.py:152-154``).
    """
    b, n, e = x.shape
    if layout == "cm":
        pats = unflatten(x, num_channels)                # (B, N, C, p, p)
        p = pats.shape[-1]
        nhwc = pats.reshape(b * n, num_channels, p, p).transpose(0, 2, 3, 1)
        out = conv(nhwc)
        return out.transpose(0, 3, 1, 2).reshape(b, n, e)
    pats = unflatten_cl(x, num_channels)                 # (B, N, p, p, C)
    p = pats.shape[2]
    out = conv(pats.reshape(b * n, p, p, num_channels))
    return out.reshape(b, n, e)


def conv_token_matrix(kernel: jnp.ndarray, num_channels: int, p: int,
                      layout: str = "cm") -> jnp.ndarray:
    """The SAME-padding CxC conv as a dense (E, E) operator on the flattened
    token vector (E = C·p²), built differentiably from the conv kernel.

    A conv on the (C, p, p) patch image is linear in the token vector; on
    fine hierarchy levels (small E) materialising it as one matrix turns the
    MXU-hostile 3-channel conv — and the NHWC layout transposes around it,
    whose backward dominates the conv's cost — into a single well-shaped
    matmul.  Returns M with ``out_tokens = tokens @ M.T``; exact (validated
    element-for-element against the conv lowering).
    """
    k = kernel.shape[0]
    half = k // 2
    # S[a, i', i] = 1 iff i - i' = a - half (the conv window offsets; zero
    # padding falls out of the clipped eye diagonals)
    shifts = jnp.stack([jnp.eye(p, k=d, dtype=jnp.float32)
                        for d in range(-half, half + 1)])
    m6 = jnp.einsum("abcd,aIi,bJj->dIJcij", kernel.astype(jnp.float32),
                    shifts, shifts)               # out (c',I,J) × in (c,i,j)
    e = num_channels * p * p
    if layout == "cm":
        return m6.reshape(e, e)
    # channels-last tokens: index = i·(p·C) + j·C + c
    return m6.transpose(1, 2, 0, 4, 5, 3).reshape(e, e)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, N, E) -> (B, H, N, E/H); head h owns the contiguous channel-major
    slice [h*E/H, (h+1)*E/H) of the flattened patch (torch/model.py:152)."""
    b, n, e = x.shape
    return x.reshape(b, n, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, dh) -> (B, N, E)."""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)


class ReAttention(nn.Module):
    """Self re-attention over patch tokens (torch/model.py:113-164).

    ``qkv_kernel=3`` matches the packaged model / README configs;
    ``qkv_kernel=1`` matches the notebook prototype (ViT_UNet.ipynb cell 26).
    ``qkv_gelu=True`` adds the TF flavour's GELU after each QKV conv
    (tf/functions.py:227-233).
    """

    dim: int
    num_channels: int = 3
    num_heads: int = 8
    qkv_kernel: int = 3
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    apply_transform: bool = True
    transform_scale: bool = False
    qkv_gelu: bool = False
    token_layout: str = "cm"  # 'cm' = channel-major flattened patches (torch
                              # flavour); 'cl' = channels-last (TF flavour,
                              # tf/functions.py:224-238)
    use_flash: bool = False  # fused Pallas re-attention (vit_unet_tpu.kernels)
    flash_train: bool = False  # fused path in training too: in-kernel attn
                               # dropout; exact batch-stats BN by default
                               # (kernels/flash_reattention_train.py)
    flash_frozen_bn: bool = False  # fast mode: freeze the head-mix BN at its
                               # running statistics during training (~10-20%
                               # faster; round-1 headline semantics, no
                               # running-average updates)
    bn_track: bool = False     # TRACKING train mode: the forward normalises
                               # with the RUNNING statistics (frozen-BN
                               # numerics) while the running averages keep
                               # updating toward each batch's own moments
                               # (stop-gradient side channel).  Batch-renorm-
                               # style warmup for the exact batch-stats
                               # semantics: after tracking, running ≈ batch
                               # stats, so flipping to use_running_average=
                               # False is a continuous change of the forward
                               # instead of a normalisation shock (the hard
                               # frozen→exact flip destroys the solution —
                               # CONVERGENCE.json segmentation_demo
                               # bn-hard-flip).  Applies when training
                               # (use_running_average=False); eval unchanged.
    sequence_parallel: bool = False  # shard the token axis over sp_axis and
                                     # all-gather K/V over ICI per layer
                                     # (parallel/sequence.py); train + eval
    sp_axis: str = "model"
    sp_data_axis: Optional[str] = "data"
    sp_mesh: Optional[jax.sharding.Mesh] = None  # explicit mesh; falls back
                                                 # to the ambient abstract mesh
    sp_min_tokens: int = 1024  # SP only pays at fine (long-token) levels
    bn_axis_name: Optional[str] = None
    bn_eps: float = 1e-5   # head-mix BatchNorm epsilon.  1e-5 is reference
                           # parity (torch BatchNorm2d default — but note the
                           # reference never trained its torch model); the
                           # Keras default 1e-3 (its trained TF variant) is
                           # the documented trainable-exact-BN setting, see
                           # docs/PERF.md "End-to-end training behavior"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        conv = lambda name: nn.Conv(
            self.num_channels, (self.qkv_kernel, self.qkv_kernel),
            padding="SAME", use_bias=self.qkv_bias,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        self.qconv2d = conv("qconv2d")
        self.kconv2d = conv("kconv2d")
        self.vconv2d = conv("vconv2d")
        if self.apply_transform:
            self.reatten_matrix = nn.Conv(
                self.num_heads, (1, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, name="reatten_matrix")
            self.var_norm = nn.BatchNorm(
                momentum=0.9, epsilon=self.bn_eps, axis=-1,
                axis_name=self.bn_axis_name, dtype=self.dtype,
                param_dtype=self.param_dtype, name="var_norm")
        self.attn_dropout = nn.Dropout(self.attn_drop)
        self.proj = nn.Dense(self.dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj")
        self.proj_dropout = nn.Dropout(self.proj_drop)

    @property
    def scale(self) -> float:
        return self.qk_scale or (self.dim // self.num_heads) ** -0.5

    #: widest token vector for which the conv-as-matmul QKV path pays.
    #: Measured (round-2 TPU microbenchmarks) at E <= 192: the dense (E, E)
    #: matmul's backward beats the per-conv NHWC path by ~0.4 ms/call.  At
    #: E >= 768 the conv's 9·C-sparse structure wins on FLOPs (the dense
    #: operator is E/9C times more work), and since round 3 those levels run
    #: the fused NCHW conv below, which removed the transpose overhead that
    #: motivated the matmul form.  256 covers the gap conservatively: no
    #: preset has a level at 192 < E < 768, so the threshold is untested
    #: between the measured endpoints but also unexercised.
    _QKV_MATMUL_MAX_E = 256

    def _qkv(self, q_in, k_in, v_in):
        def act(y):
            if self.qkv_gelu:
                y = jax.nn.gelu(y, approximate=False)
            return split_heads(y, self.num_heads)

        e = q_in.shape[-1]
        if not self.is_initializing() and e <= self._QKV_MATMUL_MAX_E:
            # conv-as-token-matmul: one (B·N, E) @ (E, 3E) for all of Q/K/V
            # when they share an input (self-attention); exact same params
            # and math, gradients flow through conv_token_matrix
            p = int(round((e // self.num_channels) ** 0.5))
            mats, biases = [], []
            for conv in (self.qconv2d, self.kconv2d, self.vconv2d):
                cp = conv.variables["params"]
                mats.append(conv_token_matrix(
                    cp["kernel"], self.num_channels, p,
                    self.token_layout).astype(self.dtype))
                if self.qkv_bias:
                    b = cp["bias"].astype(jnp.float32)
                    biases.append(
                        (jnp.repeat(b, p * p) if self.token_layout == "cm"
                         else jnp.tile(b, p * p)).astype(self.dtype))
            if q_in is k_in and k_in is v_in:
                m_all = jnp.concatenate([m.T for m in mats], axis=1)
                out = jnp.einsum("bne,ef->bnf", q_in.astype(self.dtype),
                                 m_all, preferred_element_type=self.dtype)
                qy, ky, vy = jnp.split(out, 3, axis=-1)
            else:
                qy, ky, vy = (
                    jnp.einsum("bne,fe->bnf", t.astype(self.dtype), m,
                               preferred_element_type=self.dtype)
                    for t, m in zip((q_in, k_in, v_in), mats))
            if self.qkv_bias:
                qy, ky, vy = (y + b for y, b in zip((qy, ky, vy), biases))
            return act(qy), act(ky), act(vy)

        if (not self.is_initializing() and self.token_layout == "cm"
                and q_in is k_in and k_in is v_in):
            # fused coarse-level path: ONE NCHW conv (C -> 3C) for q/k/v.
            # Channel-major tokens reshape to NCHW for free, and XLA's conv
            # accepts that layout directly via dimension_numbers — the
            # separate flax calls each forced an NHWC transpose in and out
            # whose backward dominated the conv cost (~12 ms/step on base;
            # HLO trace r3).  Same parameters, same math.
            b, n, e = q_in.shape
            c = self.num_channels
            pats = unflatten(q_in, c)                    # (B, N, C, p, p)
            p_sz = pats.shape[-1]
            kcat = jnp.concatenate(
                [conv.variables["params"]["kernel"]
                 for conv in (self.qconv2d, self.kconv2d, self.vconv2d)],
                axis=-1).astype(self.dtype)              # (k, k, C, 3C)
            out = jax.lax.conv_general_dilated(
                pats.reshape(b * n, c, p_sz, p_sz).astype(self.dtype), kcat,
                (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))
            if self.qkv_bias:
                bcat = jnp.concatenate(
                    [conv.variables["params"]["bias"]
                     for conv in (self.qconv2d, self.kconv2d, self.vconv2d)]
                ).astype(self.dtype)
                out = out + bcat.reshape(1, 3 * c, 1, 1)
            qy, ky, vy = (out.reshape(b, n, 3, e)[:, :, i] for i in range(3))
            return act(qy), act(ky), act(vy)

        def go(x, conv):
            return act(conv_tokens(x, conv, self.num_channels,
                                   layout=self.token_layout))
        return (go(q_in, self.qconv2d), go(k_in, self.kconv2d),
                go(v_in, self.vconv2d))

    def _attend_flash(self, q, k, v):
        """Fused Pallas path: online-softmax re-attention, eval semantics
        (running BN stats, no attention dropout).  Numerically equivalent to
        the XLA path — tests/test_kernels.py."""
        from vit_unet_tpu.kernels.flash_reattention import (
            expand_reattention_affine, flash_reattention)
        m_eff, c_eff = self._folded_compact()
        w, b = expand_reattention_affine(m_eff, c_eff,
                                         dh=self.dim // self.num_heads)
        v_cat = merge_heads(v)
        blk = self._flash_block(q.shape[2])
        return flash_reattention(
            (q * self.scale).astype(self.dtype), k.astype(self.dtype), v_cat,
            w, b, num_heads=self.num_heads, block_q=blk, block_k=blk,
            interpret=self._interpret(q, k, v))

    def _folded_compact(self):
        """(m_eff, c_eff) from the head-mix conv + BN running stats; also
        touches both layers so the param tree matches the XLA path."""
        from vit_unet_tpu.kernels.flash_reattention import (
            fold_reattention_compact)
        dummy = jnp.zeros((1, 1, 1, self.num_heads), self.dtype)
        _ = self.var_norm(self.reatten_matrix(dummy), use_running_average=True)
        cp = self.reatten_matrix.variables["params"]
        bp = self.var_norm.variables["params"]
        bs = self.var_norm.variables["batch_stats"]
        return fold_reattention_compact(
            cp["kernel"], cp["bias"], bp["scale"], bp["bias"],
            bs["mean"], bs["var"], eps=self.bn_eps,
            reatten_scale=self.scale if self.transform_scale else 1.0)

    def _flash_block(self, n: int, bn: bool = False,
                     train: bool = False) -> int:
        """Adaptive kernel tile size, from the r3 TPU tile sweeps
        (tools/tile_bench.jsonl; all numbers fwd+bwd per call;
        ``bn``: the exact batch-stats kernels keep the r3 envelope — the
        round-5 single-tile-896 bottleneck rule is frozen/eval-only):

        * thin heads (dh <= 48): 512 tiles win big — lite level-2
          (H4, dh48, N784) -25% vs 128; H8/dh48/N784 -14%.  The round-2
          "Mosaic crashes at (H8, dh48, block 256)" belonged to the old
          3-pass backward; the fused single-pass design compiles to 512.
        * long fine levels (dh <= 32, H <= 4): 512 vs 640 chosen by
          padded-token waste (N=3136 pads 3200 with 640 vs 3584 with 512 —
          640 is -24%; N=784 favours 512).  Thin-bk variants that removed
          padding entirely, (896,128)/(448,128), lost to per-k-step
          overheads, and (896,896) still Mosaic-crashes: 512/640 is the
          practical ceiling.
        * mid levels (dh <= 96): 256 wins both single-tile (H8, dh96,
          N196: -16% train / -12% bn) and multi-tile (H8, dh96, N1024:
          -19% / -14%); (512,512) at proj=768 Mosaic-crashes, so 256 is
          the ceiling here.
        * wide heads at single-k-tile lengths (dh <= 384, n <= 256): 256
          wins -15% vs the old 64 (notebook512 coarse, H8/dh384/N256);
          multi-tile wide-proj grids keep 64 for VMEM ((H, block, 3072)
          f32 accumulators).
        * H = 16 (classifier envelope) stays block-128-validated.

        For n in (128, 256] every tile <= 256 pads N to 256, so 256 is
        free of padding waste exactly where it wins; the fine levels pick
        between 512/640 by padded-score-area waste.

        The pick table itself lives in
        ``kernels.flash_reattention.pick_flash_block`` (shared with the
        rectangular sequence-parallel call)."""
        from vit_unet_tpu.kernels.flash_reattention import pick_flash_block
        return pick_flash_block(n, num_heads=self.num_heads,
                                dh=self.dim // self.num_heads, bn=bn,
                                train=train)

    @staticmethod
    def _interpret(*arrays) -> bool:
        # Interpret off-TPU (tests/CPU).  Execution-platform authority, in
        # order: (1) the committed device of a concrete input array — a CPU
        # array in a TPU-plugin process must NOT select the TPU-compiled
        # pallas_call (VERDICT r2 Weak #4); (2) under jit the inputs are
        # tracers with no device, so fall back to the pinned default device
        # (the installed TPU plugin ignores JAX_PLATFORMS); (3) the default
        # backend.
        for a in arrays:
            if isinstance(a, jax.Array) and not isinstance(a, jax.core.Tracer):
                devs = a.devices()
                if devs:
                    return next(iter(devs)).platform != "tpu"
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        return platform != "tpu"

    def _flash_seed(self, rate: float):
        if rate > 0.0:
            if not self.has_rng("dropout"):
                # match flax nn.Dropout's contract: dropout without an rng
                # stream is an error, not a silent fixed mask
                raise ValueError(
                    "flash_train attention dropout needs an rng: pass "
                    "rngs={'dropout': key} to apply() (attn_drop="
                    f"{self.attn_drop})")
            return jax.random.randint(self.make_rng("dropout"), (),
                                      0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
        return jnp.zeros((), jnp.int32)

    def _attend_flash_train(self, q, k, v, *, use_running_average: bool):
        """Training-path fused kernels (custom VJP, no N² HBM residuals).

        ``use_running_average=False`` (the normal train step) runs the
        batch-stats kernel — EXACT reference semantics: the head-mix
        BatchNorm normalises with this batch's own moments, the running
        averages are updated, and the gradient includes the
        through-the-statistics terms (flash_reattention_train_bn).
        ``True`` (or ``flash_frozen_bn=True``, the explicit ~10-20%-faster
        mode) runs the frozen-running-stats variant."""
        from vit_unet_tpu.kernels.flash_reattention_train import (
            flash_reattention_train, flash_reattention_train_bn)
        v_cat = merge_heads(v)
        interp = self._interpret(q, k, v)
        # in-kernel PRNG is TPU-only: interpret mode runs dropout-free
        rate = 0.0 if interp else float(self.attn_drop)
        seed = self._flash_seed(rate)
        # track/exact modes run a batch-stats sweep (moments or bn kernel):
        # those keep the bn envelope; the frozen train path gets the 896
        # rule (train kernels only — eval is slower there)
        blk = self._flash_block(
            q.shape[2], train=True,
            bn=not (use_running_average or self.flash_frozen_bn))
        if use_running_average or self.flash_frozen_bn:
            m_eff, c_eff = self._folded_compact()
            return flash_reattention_train(
                (q * self.scale).astype(self.dtype), k.astype(self.dtype),
                v_cat, m_eff, c_eff, seed, self.num_heads, rate,
                blk, blk, interp)
        if self.bn_track:
            # tracking mode: frozen-stat forward (differentiable), plus a
            # stop-gradient stats sweep feeding the running-average EMA —
            # same dropout seed, so the moments are those of the masked
            # probabilities the forward used
            from vit_unet_tpu.kernels.flash_reattention_train import (
                flash_bn_batch_moments)
            m_eff, c_eff = self._folded_compact()
            out = flash_reattention_train(
                (q * self.scale).astype(self.dtype), k.astype(self.dtype),
                v_cat, m_eff, c_eff, seed, self.num_heads, rate,
                blk, blk, interp)
            cp = self.reatten_matrix.variables["params"]
            sg = jax.lax.stop_gradient
            mu, var = flash_bn_batch_moments(
                sg((q * self.scale).astype(self.dtype)),
                sg(k.astype(self.dtype)), sg(v_cat),
                sg(cp["kernel"].reshape(self.num_heads, self.num_heads).T),
                sg(cp["bias"]), seed, self.num_heads, rate, blk, blk, interp)
            # the 2-point stat tensor stays float32: with bf16 compute dtype
            # s ~ 1e-3·mu rounds away in mu±s exactly in the near-degenerate
            # regime tracking is meant to follow (flax's running stats are
            # f32 and _compute_stats works in >= f32; only the discarded
            # output depends on dtype)
            s = jnp.sqrt(jnp.maximum(var, 0.0))
            stat = jnp.stack([mu - s, mu + s])[:, None, None, :]
            _ = self.var_norm(sg(stat.astype(jnp.float32)),
                              use_running_average=False)
            return out
        # touch both layers so the param tree matches the XLA path
        dummy = jnp.zeros((1, 1, 1, self.num_heads), self.dtype)
        _ = self.var_norm(self.reatten_matrix(dummy), use_running_average=True)
        cp = self.reatten_matrix.variables["params"]
        bp = self.var_norm.variables["params"]
        out, mu, var = flash_reattention_train_bn(
            (q * self.scale).astype(self.dtype), k.astype(self.dtype),
            v_cat, cp["kernel"].reshape(self.num_heads, self.num_heads).T,
            cp["bias"], bp["scale"], bp["bias"], seed, self.num_heads, rate,
            blk, blk, interp, self.bn_eps,
            self.scale if self.transform_scale else 1.0)
        # feed the exact batch moments into var_norm's running averages via
        # a 2-point tensor whose batch statistics are (mu, var) — flax's EMA
        # update then matches the unsharded XLA path bit-for-bit
        s = jnp.sqrt(jnp.maximum(var, 0.0))
        stat = jnp.stack([mu - s, mu + s])[:, None, None, :]
        # float32 on purpose (not self.dtype): under bf16 the ±s offsets can
        # round away against mu, corrupting the recovered variance; the
        # output is discarded and flax's running stats are f32 regardless
        _ = self.var_norm(jax.lax.stop_gradient(stat.astype(jnp.float32)),
                          use_running_average=False)
        return out

    @property
    def _flash_ok(self) -> bool:
        """Envelope validated by TPU shape sweeps (fwd + train custom-VJP,
        rel err <= ~7e-3 vs XLA on-chip, grads included):

        * <= 8 heads with per-head dim <= 384 — every ViT-UNet level of
          every preset, including the 3072-proj coarse one (block 64);
        * <= 16 heads with per-head dim <= 48 — both ViT-classifier levels.

        (Round 1 had to exclude dh > 128 and 16 heads: the old 3-pass
        backward's D/dm kernel crashed the Mosaic compiler there.  The fused
        single-pass backward + o_norm-residual redesign compiles and passes
        gradient checks across the whole sweep.)  Anything wider takes the
        XLA path."""
        dh = self.dim // self.num_heads
        if self.num_heads <= 8:
            return dh <= 384
        return self.num_heads <= 16 and dh <= 48

    def _flash_ok_for(self, n: int) -> bool:
        """Shape gate + token floor: below ~one tile of tokens the N² map is
        trivial and the flash residual/partial IO only costs — base's N=49
        coarse level runs 7% faster end-to-end on XLA (TPU ablation)."""
        return n >= 128 and self._flash_ok

    def _sp_mesh_for(self, n: int):
        """The mesh to sequence-parallelise over, or None if SP doesn't
        apply (no mesh / axis missing / axis size 1 / token count too small
        or not divisible)."""
        if not self.sequence_parallel:
            return None
        mesh = self.sp_mesh
        if mesh is None:
            am = jax.sharding.get_abstract_mesh()
            if am is not None and self.sp_axis in getattr(am, "shape", {}):
                mesh = am
        if mesh is None or self.sp_axis not in mesh.shape:
            return None
        size = mesh.shape[self.sp_axis]
        if size <= 1 or n < self.sp_min_tokens or n % size:
            return None
        return mesh

    def _attend_sp(self, q, k, v, mesh, *, deterministic,
                   use_running_average):
        """Sequence-parallel path (parallel/sequence.py): token rows sharded
        over ``sp_axis``, K/V all-gathered over ICI.  Eval uses the folded
        running-stats affine; training runs dropout + batch-stats BN with
        cross-shard psums, then feeds the exact batch statistics back into
        ``var_norm``'s running averages.  ``bn_track`` composes: the frozen
        forward plus a cross-shard moments sweep whose result feeds the EMA
        (``track_stats`` in sequence.py), matching the unsharded tracking
        warmup exactly."""
        from vit_unet_tpu.parallel.sequence import (
            sequence_parallel_reattention, sequence_parallel_reattention_train)

        q = (q * self.scale).astype(self.dtype)
        # per-shard flash: the kernel envelope gates it exactly as on one
        # chip; local query rows below one tile keep the XLA shard body
        # (same token floor as _flash_ok_for)
        n_local = q.shape[2] // mesh.shape[self.sp_axis]
        flash_ok = self._flash_ok and n_local >= 128
        if deterministic and use_running_average:
            m_eff, c_eff = self._folded_compact()
            return sequence_parallel_reattention(
                q, k.astype(self.dtype), v.astype(self.dtype), m_eff, c_eff,
                mesh, axis=self.sp_axis, data_axis=self.sp_data_axis,
                use_flash=self.use_flash and flash_ok)

        cp = self.reatten_matrix.variables["params"]
        bp = self.var_norm.variables["params"]
        rate = 0.0 if deterministic else float(self.attn_drop)
        rng = self.make_rng("dropout") if rate > 0.0 else None
        # flash_frozen_bn: the documented fast training mode freezes the BN
        # statistics exactly as on one chip (_attend_flash_train)
        frozen_fast = (self.flash_train and self.flash_frozen_bn and flash_ok
                       and not use_running_average)
        tracking = (self.bn_track and not use_running_average
                    and not frozen_fast)
        if use_running_average or frozen_fast or tracking:
            bs = self.var_norm.variables["batch_stats"]
            running = (bs["mean"], bs["var"])
        else:
            running = None
        out, mean, var = sequence_parallel_reattention_train(
            q, k.astype(self.dtype), v.astype(self.dtype),
            cp["kernel"].reshape(self.num_heads, self.num_heads), cp["bias"],
            bp["scale"], bp["bias"], mesh, dropout_rng=rng, rate=rate,
            axis=self.sp_axis, data_axis=self.sp_data_axis, eps=self.bn_eps,
            reatten_scale=self.scale if self.transform_scale else 1.0,
            running_stats=running,
            # frozen mode folds the running stats; batch-stats mode runs
            # the bn kernel with cross-shard psum'd moments — see sequence.py
            use_flash=self.flash_train and flash_ok,
            track_stats=tracking)
        if (not use_running_average and not frozen_fast) or tracking:
            # Update var_norm's running averages through the normal flax
            # machinery: a 2-point tensor per feature with batch statistics
            # exactly (mean, var) — BatchNorm's EMA update then matches the
            # unsharded path bit-for-bit (output discarded).  float32 on
            # purpose (not self.dtype): under bf16 the ±s offsets can round
            # away against mean, corrupting the recovered variance; flax's
            # running stats are f32 regardless.
            s = jnp.sqrt(jnp.maximum(var, 0.0))
            dummy = jnp.stack([mean - s, mean + s])[:, None, None, :]
            _ = self.var_norm(
                jax.lax.stop_gradient(dummy.astype(jnp.float32)),
                use_running_average=False)
        return out

    def _attend(self, q, k, v, *, deterministic, use_running_average):
        if (self.apply_transform and not self.is_initializing()):
            sp_mesh = self._sp_mesh_for(q.shape[2])
            if sp_mesh is not None:
                return self._attend_sp(
                    q, k, v, sp_mesh, deterministic=deterministic,
                    use_running_average=use_running_average)
        if (self.use_flash and self._flash_ok_for(q.shape[2])
                and self.apply_transform
                and deterministic and use_running_average
                and not self.is_initializing()):
            return self._attend_flash(q, k, v)
        if (self.use_flash and self.flash_train
                and self._flash_ok_for(q.shape[2])
                and self.apply_transform and not deterministic
                and not self.is_initializing()
                # batch-stats mode (use_running_average=False) is validated
                # for <= 8 heads; wider falls through to the XLA path
                # unless the frozen-BN fast mode is requested
                and (use_running_average or self.flash_frozen_bn
                     or self.num_heads <= 8)):
            return self._attend_flash_train(
                q, k, v, use_running_average=use_running_average)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=self.dtype) * self.scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        if self.apply_transform:
            # 1x1 conv across heads + BatchNorm over heads: run both in NHWC
            # ((B, N, M, H)) so the head axis is the feature axis.
            a = attn.transpose(0, 2, 3, 1)
            a = self.reatten_matrix(a)
            track = self.bn_track and not use_running_average
            a_n = self.var_norm(
                a, use_running_average=use_running_average or track)
            if track:
                # tracking EMA side channel: the forward above used the
                # running stats; update them toward this batch's moments
                # (output discarded, gradients stopped) — same semantics as
                # the flash-path flash_bn_batch_moments update
                _ = self.var_norm(jax.lax.stop_gradient(a),
                                  use_running_average=False)
            a = a_n
            attn = a.transpose(0, 3, 1, 2)
            reatten_scale = self.scale if self.transform_scale else 1.0
            attn = attn * reatten_scale
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=self.dtype)
        return merge_heads(out)

    def __call__(self, x, *, deterministic: bool = True,
                 use_running_average: bool = True):
        q, k, v = self._qkv(x, x, x)
        out = self._attend(q, k, v, deterministic=deterministic,
                           use_running_average=use_running_average)
        out = self.proj(out)
        return self.proj_dropout(out, deterministic=deterministic)


class SkipConnection(nn.Module):
    """Cross-attention skip fusion (torch/model.py:211-259): query = encoder
    skip, key/value = decoder stream; re-attention transform always on."""

    dim: int
    num_channels: int = 3
    num_heads: int = 8
    qkv_kernel: int = 3
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    transform_scale: bool = False
    qkv_gelu: bool = False
    use_flash: bool = False
    flash_train: bool = False
    flash_frozen_bn: bool = False
    bn_track: bool = False
    sequence_parallel: bool = False
    sp_mesh: Optional[jax.sharding.Mesh] = None
    sp_min_tokens: int = 1024
    bn_axis_name: Optional[str] = None
    bn_eps: float = 1e-5   # head-mix BatchNorm epsilon.  1e-5 is reference
                           # parity (torch BatchNorm2d default — but note the
                           # reference never trained its torch model); the
                           # Keras default 1e-3 (its trained TF variant) is
                           # the documented trainable-exact-BN setting, see
                           # docs/PERF.md "End-to-end training behavior"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True,
                 use_running_average: bool = True):
        inner = ReAttention(
            dim=self.dim, num_channels=self.num_channels,
            num_heads=self.num_heads, qkv_kernel=self.qkv_kernel,
            qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
            proj_drop=self.proj_drop, apply_transform=True,
            transform_scale=self.transform_scale, qkv_gelu=self.qkv_gelu,
            use_flash=self.use_flash, flash_train=self.flash_train,
            flash_frozen_bn=self.flash_frozen_bn, bn_track=self.bn_track,
            sequence_parallel=self.sequence_parallel, sp_mesh=self.sp_mesh,
            sp_min_tokens=self.sp_min_tokens,
            bn_axis_name=self.bn_axis_name, bn_eps=self.bn_eps,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn")
        qh, kh, vh = inner._qkv(q, k, v)
        out = inner._attend(qh, kh, vh, deterministic=deterministic,
                            use_running_average=use_running_average)
        out = inner.proj(out)
        return inner.proj_dropout(out, deterministic=deterministic)
