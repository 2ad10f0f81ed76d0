"""Device-resident dataset cache + on-device batch assembly.

The host loader (data/loader.py) re-uploads every batch's dense features
each epoch.  On a fast PCIe link that is free; on a slow host<->device
link it becomes THE training bottleneck: the r5 TRAIN_loop measurement
put per-batch H2D at ~70-110 ms against a ~19 ms device step, and
concurrent device_put streams made it WORSE (2.8 vs 18-28 MB/s single
stream), so no amount of prefetch depth can hide it — bandwidth binds.

The TPU-native fix is to stop moving the bytes: upload every utterance's
padded feature rows ONCE (mel/tokens/durations/f0/energy at the
converter's corpus-fit shapes), then assemble each batch ON DEVICE with
one jitted gather.  Steady-state per-step H2D collapses to a single
packed int32 plan vector (utterance indices + the regroup plan's index
arrays, ~tens of KB) because the plan's dense halves — frame_mask and
position — derive on device from seg_dur bit-exactly
(d < dur, and float32 single-rounded d/dur equals numpy's
float64-then-float32 for the whole d,dur <= 64 domain; verified in
tests/test_device_cache.py).

Parity: the assembled Batch is bit-identical to BatchConverter.__call__
on the same utterances (tests/test_device_cache.py pins every leaf).
Reference scope: this replaces the reference's per-batch CustomConverter
host work (/root/reference/tts.py:215-306) only as TRANSPORT — the plan
semantics are ops/regroup's, unchanged.

Batch membership changes every epoch under the reference's ``shuffle``
batching (/root/reference/batchfy_fcl.py:291), so caching CONVERTED
batches would be wrong; caching per-utterance rows and re-gathering is
exact.
"""

import threading
from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from fcl_taco2_tpu.models.taco2_sa import Batch, SegClass


class DeviceCache(NamedTuple):
    """Per-utterance padded feature rows, device-resident.  Row N (the
    last) is all-zero: gathering it reproduces the converter's empty
    pad utterances (ilens=0) exactly."""

    tokens: Any     # (N+1, Tmax) int32
    durations: Any  # (N+1, Tmax) int32
    mel: Any        # (N+1, Lmax, odim) float32
    f0: Any         # (N+1, Tmax, 1) float32
    energy: Any     # (N+1, Tmax, 1) float32
    ilens: Any      # (N+1,) int32
    olens: Any      # (N+1,) int32
    spembs: Any     # (N+1, dim) float32 or None


def _require_fixed(converter):
    if not (converter.fixed_tmax and converter.fixed_lmax):
        raise ValueError("device cache requires corpus-fit fixed shapes "
                         "(BatchConverter.fit_corpus)")
    if converter.transform is not None:
        raise ValueError("device cache cannot apply per-epoch host mel "
                         "transforms (preprocess_conf); disable one")
    if converter.duration_classes and converter.class_caps is None:
        raise ValueError("device cache with duration classes requires "
                         "corpus-fit class_caps")
    if not converter.duration_classes and not converter.fixed_nseg:
        raise ValueError("device cache requires a corpus-fit fixed_nseg "
                         "(the assemble program compiles one plan layout)")


def estimate_cache_bytes(converter, n_utts, spk_embed_dim=0):
    """Device bytes the cache will occupy (for the auto gate)."""
    T, L = converter.fixed_tmax, converter.fixed_lmax
    odim = converter.odim
    per = 4 * (T + T + L * odim + T + T + 2 + spk_embed_dim)
    return (n_utts + 1) * per


class DeviceBatchCache:
    """Build once per Trainer; exposes PrefetchLoader-compatible
    ``plan`` (host, numpy) and ``assemble`` (upload one packed int32
    vector + one jitted gather -> device Batch) stages."""

    def __init__(self, converter, utts, device=None):
        _require_fixed(converter)
        self.converter = converter
        self.B = converter.batch_size
        self.Tmax = converter.fixed_tmax
        self.Lmax = converter.fixed_lmax
        self.device = device or jax.devices()[0]
        self._rows = {}
        self._host_dur = []   # per-row true-length duration vectors
        self._assemble = None
        self._lock = threading.Lock()  # lazy assemble init under workers
        self._build(utts)

    # ---------- one-time cache construction ----------

    def _build(self, utts):
        conv, B, T, L = self.converter, self.B, self.Tmax, self.Lmax
        N = len(utts)
        odim = conv.odim
        tokens = np.zeros((N + 1, T), np.int32)
        durs = np.zeros((N + 1, T), np.int32)
        mel = np.zeros((N + 1, L, odim), np.float32)
        f0 = np.zeros((N + 1, T, 1), np.float32)
        en = np.zeros((N + 1, T, 1), np.float32)
        ilens = np.zeros(N + 1, np.int32)
        olens = np.zeros(N + 1, np.int32)
        spembs = None
        from fcl_taco2_tpu.data.manifest import load_spemb
        for i, u in enumerate(utts):
            if u.uttid in self._rows:
                raise ValueError(f"duplicate uttid {u.uttid}")
            self._rows[u.uttid] = i
            m, d, p, e = conv._features(u)
            nT, nL = u.n_tokens, m.shape[0]
            if int(d.sum()) != nL:
                raise ValueError(
                    f"{u.uttid}: durations sum {int(d.sum())} != mel "
                    f"frames {nL}")
            tokens[i, :nT] = u.tokenids
            durs[i, :nT] = d
            mel[i, :nL] = m
            f0[i, :nT] = p
            en[i, :nT] = e
            ilens[i] = nT
            olens[i] = nL
            self._host_dur.append(np.asarray(d, np.int32))
            v = load_spemb(u)
            if v is not None:
                if spembs is None:
                    spembs = np.zeros((N + 1, v.shape[0]), np.float32)
                spembs[i] = v
            elif spembs is not None:
                raise ValueError(
                    "inconsistent speaker embeddings: every utterance "
                    "needs a spembs entry once any has one")
        host = DeviceCache(tokens, durs, mel, f0, en, ilens, olens, spembs)
        self.bytes = sum(a.nbytes for a in host if a is not None)
        # ONE upload for the whole run; per-batch H2D is the plan pack only
        self.cache = jax.device_put(host, self.device)

    # ---------- per-batch host stage (PrefetchLoader convert_fn) ----------

    def plan(self, utts):
        """Utterance list -> (packed int32 plan vector, static layout).
        Mirrors BatchConverter.__call__'s plan construction; dense plan
        halves (frame_mask/position) are NOT packed — they derive on
        device from seg_dur."""
        conv, B, T, L = self.converter, self.B, self.Tmax, self.Lmax
        n = len(utts)
        if n > B:
            raise ValueError(f"batch of {n} exceeds configured size {B}")
        idx = np.full(B, len(self._host_dur), np.int32)  # pad -> zero row
        durations = np.zeros((B, T), np.int32)
        olens = np.zeros(B, np.int32)
        for i, u in enumerate(utts):
            r = self._rows.get(u.uttid)
            if r is None:
                raise KeyError(f"{u.uttid} not in device cache")
            idx[i] = r
            d = self._host_dur[r]
            durations[i, :len(d)] = d
            olens[i] = int(d.sum())

        parts = [idx]
        if conv.duration_classes:
            plan = conv._build_classed_plan(durations, olens,
                                            conv.class_caps, L)
            for cp in plan.classes:
                parts += [cp.seg_utt, cp.seg_tok, cp.seg_start, cp.seg_dur]
        else:
            plan = conv._build_plan(durations, olens, conv.fixed_nseg, L)
            parts += [plan.seg_utt, plan.seg_tok, plan.seg_start,
                      plan.seg_dur]
        parts.append(plan.utt_gather.reshape(-1))
        layout = tuple(p.size for p in parts)
        return np.concatenate([p.reshape(-1).astype(np.int32)
                               for p in parts]), layout

    # ---------- per-batch device stage (PrefetchLoader put_fn) ----------

    def static_layout(self):
        """The packed plan vector's segment sizes, derivable from the
        converter's corpus-fit config alone (fixed shapes make plan()
        emit this exact layout for every batch)."""
        conv, B, L = self.converter, self.B, self.Lmax
        if conv.duration_classes:
            seg = [c for P_c in conv.class_caps for c in (P_c,) * 4]
        else:
            seg = [conv.fixed_nseg] * 4
        return tuple([B] + seg + [B * L])

    def assemble(self, packed_and_layout):
        packed, layout = packed_and_layout
        with self._lock:
            if self._assemble is None:
                self._assemble = jax.jit(self.raw_assemble(layout))
            elif layout != self._layout:
                raise ValueError("plan layout changed mid-run (fixed "
                                 "shapes should make it constant)")
        return self._assemble(jax.device_put(packed, self.device))

    def raw_assemble(self, layout=None):
        """Unjitted (P,) int32 plan vector -> Batch gather program —
        trace it inside a larger jit (e.g. the chained train step scans
        assemble+step over stacked packs, train/step.py) or jit it
        standalone (``assemble``).  The cache arrays ride as captured
        device constants: zero per-call H2D."""
        conv, B, T, L = self.converter, self.B, self.Tmax, self.Lmax
        layout = self.static_layout() if layout is None else layout
        self._layout = layout
        cache = self.cache
        classed = bool(conv.duration_classes)
        caps = conv.class_caps if classed else None
        durs_c = conv.duration_classes

        offs = np.concatenate([[0], np.cumsum(layout)]).astype(int)

        def seg_fields(flat, o, P_c, D_c):
            su = flat[offs[o]:offs[o] + P_c]
            st = flat[offs[o + 1]:offs[o + 1] + P_c]
            ss = flat[offs[o + 2]:offs[o + 2] + P_c]
            sd = flat[offs[o + 3]:offs[o + 3] + P_c]
            d = jnp.arange(D_c, dtype=jnp.int32)[None, :]
            fm = d < sd[:, None]
            # float32 single-rounded division == the host plan's
            # float64-then-float32 for this domain (module docstring)
            pos = jnp.where(
                fm, d.astype(jnp.float32)
                / jnp.maximum(sd, 1).astype(jnp.float32)[:, None],
                0.0)
            return su, st, ss, fm, pos

        def assemble(flat):
            idx = flat[offs[0]:offs[0] + B]
            common = dict(
                tokens=cache.tokens[idx], ilens=cache.ilens[idx],
                mel=cache.mel[idx], olens=cache.olens[idx],
                durations=cache.durations[idx], f0=cache.f0[idx],
                energy=cache.energy[idx],
                spembs=None if cache.spembs is None else cache.spembs[idx])
            utt_mask = (jnp.arange(L, dtype=jnp.int32)[None, :]
                        < common["olens"][:, None])
            o = 1
            if classed:
                seg_classes = []
                for P_c, D_c in zip(caps, durs_c):
                    su, st, ss, fm, pos = seg_fields(flat, o, P_c, D_c)
                    seg_classes.append(SegClass(su, st, ss, fm, pos))
                    o += 4
                ug = flat[offs[o]:offs[o] + B * L].reshape(B, L)
                return Batch(seg_utt=None, seg_tok=None, seg_start=None,
                             frame_mask=None, position=None,
                             utt_gather=ug, utt_mask=utt_mask,
                             seg_classes=tuple(seg_classes), **common)
            P = layout[1]
            su, st, ss, fm, pos = seg_fields(flat, o, P, conv.max_dur)
            ug = flat[offs[5]:offs[5] + B * L].reshape(B, L)
            return Batch(seg_utt=su, seg_tok=st, seg_start=ss,
                         frame_mask=fm, position=pos, utt_gather=ug,
                         utt_mask=utt_mask, **common)

        return assemble
