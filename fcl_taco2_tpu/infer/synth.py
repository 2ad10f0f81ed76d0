"""Synthesis driver: batched multi-utterance decode with speed metrics.

Replaces the reference decode loop (/root/reference/tts.py:605-687): loads a
checkpoint, walks the test manifest, synthesizes mel, measures frames/sec
per utterance + mean, writes kaldi ark/scp (for parallel-wavegan-decode) or
npy.  Improvements over the reference: utterances are synthesized in
BATCHES (the reference is batch-1, tts.py:655-674), shapes are bucketed so
the jit cache stays small, and the duration/pitch/energy control knobs are
exposed per call (e2e_tts_tacotron2_sa.py:642-658).
"""

import math
import os
import time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from fcl_taco2_tpu.data.manifest import Utterance
from fcl_taco2_tpu.infer.ark import ArkScpWriter
from fcl_taco2_tpu.models.taco2_sa import Tacotron2SA


def _round_up(x, mult):
    return int(math.ceil(max(x, 1) / mult) * mult)


class Synthesizer:
    def __init__(self, model: Tacotron2SA, params, state, batch_size=8,
                 tok_bucket=32, frame_per_token=16, frame_bucket=256,
                 mesh=None, ragged_decode=True, quantize="none",
                 decoder_backend="auto"):
        """``mesh``: optional jax Mesh for multi-chip serving — params are
        replicated, the utterance axis is sharded over all mesh axes (the
        phoneme-segment axis inside synthesize shards with it: segments
        are utterance-major, so decode compute stays chip-local).
        batch_size must divide by the mesh size.
        ``ragged_decode``: duration-sorted, duration-bounded AR decode
        (Tacotron2SA.synthesize); off = legacy max_dur-capped loops.
        ``quantize``: "none" | "int8" — int8 weight-only quantization of
        the weight-streaming Pallas decoder's streamed matrices (halves
        its DMA bytes; see Tacotron2SA.synthesize).
        ``decoder_backend``: forwarded to Tacotron2SA.decode_segments
        ("auto" | "scan" | "pallas" | "pallas_hbm" | "hybrid")."""
        self.model = model
        self.mesh = mesh
        self.ragged_decode = bool(ragged_decode)
        self.quantize = quantize
        self.decoder_backend = decoder_backend
        if mesh is not None and batch_size % mesh.devices.size:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"mesh size {mesh.devices.size}")
        # transfer once, through a jitted identity: executable OUTPUT
        # buffers take the fast path on remote-device links, while raw
        # device_put literals can stall the relay for minutes.  Params stay
        # fp32: measured on v5e, bf16-resident weights make the AR scan
        # SLOWER (4.2 vs 3.1 ms) — the compute-dtype cast inside synthesize
        # handles precision policy.
        from fcl_taco2_tpu.utils.device import device_put_via_jit as put
        if mesh is None:
            self.params = put(params)
            self.state = put(state)
        else:
            from fcl_taco2_tpu.parallel.mesh import replicated
            rep = replicated(mesh)
            self.params = jax.device_put(params, rep)
            self.state = jax.device_put(state, rep)
        from fcl_taco2_tpu.utils.device import warmup_transfers
        warmup_transfers()  # absorb the one-time D2H link init here
        # one-time int8 codes: the inline path re-reads ~50 MB of weights
        # inside EVERY jitted call (loop-invariant only within one call);
        # skipped for backends that can never consume them
        self.prequant = None
        if decoder_backend in ("auto", "pallas_hbm", "hybrid"):
            from fcl_taco2_tpu.ops.decoder_pallas import maybe_prequantize
            self.prequant = maybe_prequantize(model.cfg,
                                              self.params["decoder"],
                                              quantize)
            if self.prequant is not None and mesh is not None:
                # closure constant must be replicated like the params
                from fcl_taco2_tpu.parallel.mesh import replicated
                self.prequant = jax.device_put(self.prequant,
                                               replicated(mesh))
        self.batch_size = batch_size
        self.tok_bucket = tok_bucket
        self.frame_per_token = frame_per_token
        self.frame_bucket = frame_bucket
        self._jitted = {}

    def _put_batch(self, x):
        """Batch-axis placement: sharded over the mesh when serving
        multi-chip, plain device transfer otherwise.  Multi-process: every
        host calls with the SAME logical batch and contributes its
        addressable shards (the make_global_batch contract,
        parallel/distributed.py)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from fcl_taco2_tpu.parallel.mesh import batch_shardings
        if jax.process_count() > 1:
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, batch_shardings(self.mesh), lambda idx: x[idx])
        return jax.device_put(x, batch_shardings(self.mesh))

    def _fn(self, B, Tmax, budget, warm_args=None):
        # d_factor is a traced argument of the jitted fn (NOT part of this
        # cache key): changing the speaking rate costs zero recompiles
        key = (B, Tmax, budget)
        if key not in self._jitted:
            def make_core(use_dur):
                def core(params, state, tokens, ilens, durations, key,
                         d_factor):
                    return self.model.synthesize(
                        params, state, tokens, ilens, key,
                        frame_budget=budget,
                        durations=durations if use_dur else None,
                        d_factor=d_factor,
                        ragged_decode=self.ragged_decode,
                        quantize=self.quantize,
                        decoder_backend=self.decoder_backend,
                        prequant=self.prequant)
                return core

            if self.mesh is not None and self.mesh.devices.size > 1:
                # explicit SPMD: every op in synthesize is batch-parallel,
                # so each chip runs the WHOLE program on its shard of the
                # utterance axis (shard_map, params replicated).  This
                # also keeps the fused Pallas decoder usable per chip —
                # implicit jit partitioning has no SPMD rule for the
                # custom call.  The PRNG key is replicated, so the
                # always-on prenet dropout draws per-shard (stochastic
                # inference either way, decoder_sa.py:109-112).
                try:  # stable since jax 0.8 (check_rep -> check_vma)
                    from jax import shard_map
                    check_kw = {"check_vma": False}
                except ImportError:
                    from jax.experimental.shard_map import shard_map
                    check_kw = {"check_rep": False}
                from jax.sharding import PartitionSpec as P

                b, r = P(tuple(self.mesh.axis_names)), P()

                def wrap(use_dur):
                    return shard_map(make_core(use_dur), mesh=self.mesh,
                                     in_specs=(r, r, b, b, b, r, r),
                                     out_specs=b, **check_kw)
                cores = {True: wrap(True), False: wrap(False)}
            else:
                cores = {True: make_core(True), False: make_core(False)}

            def fn(params, state, tokens, ilens, durations, use_dur, key,
                   d_factor):
                return cores[use_dur](params, state, tokens, ilens,
                                      durations, key, d_factor)
            jit_kw = {}
            if self.mesh is not None and jax.process_count() > 1:
                # multi-process serving: replicate outputs (the compiled
                # all-gather is the DataParallel gather semantic,
                # tts.py:365-373) so every host can read back the full
                # mels — per-shard outputs would not be addressable here
                from fcl_taco2_tpu.parallel.mesh import replicated
                jit_kw["out_shardings"] = replicated(self.mesh)
            jitted = jax.jit(fn, static_argnames=("use_dur",), **jit_kw)
            if warm_args is not None:
                # exclude compile time from the speed metric (the reference
                # measures pure decode wall, tts.py:665-672)
                jax.block_until_ready(jitted(*warm_args)["mel"])
            self._jitted[key] = jitted
        return self._jitted[key]

    def _dispatch(self, token_lists: List[np.ndarray], rng,
                  durations: Optional[List[np.ndarray]] = None,
                  d_factor: float = 1.0):
        """Asynchronously dispatch one batch; returns a pending handle for
        ``_consume``.  The device computes while the host prepares (or
        reads back) other batches — on remote-device links the D2H
        readback is a large share of serving wall, so overlapping it with
        the next batch's compute is close to free throughput."""
        n = len(token_lists)
        B = self.batch_size
        if n > B:
            raise ValueError(f"{n} utterances > batch_size {B}")
        Tmax = _round_up(max(len(t) for t in token_lists), self.tok_bucket)
        if durations is not None:
            # exact budget from the given durations — replicate the device's
            # per-phoneme round(d * factor) + clip so it never truncates
            D = self.model.cfg.max_dur
            need = max(
                int(np.clip(np.round(np.asarray(d, np.float32)
                                     * np.float32(d_factor)),
                            0, D).sum())
                for d in durations)
            budget = _round_up(need, self.frame_bucket)
        else:
            budget = _round_up(
                int(math.ceil(Tmax * self.frame_per_token
                              * max(d_factor, 1.0))), self.frame_bucket)
        tokens = np.zeros((B, Tmax), np.int32)
        ilens = np.zeros(B, np.int32)
        durs = np.zeros((B, Tmax), np.int32)
        for i, t in enumerate(token_lists):
            tokens[i, :len(t)] = t
            ilens[i] = len(t)
            if durations is not None:
                durs[i, :len(t)] = durations[i]
        dev_args = (self.params, self.state, self._put_batch(tokens),
                    self._put_batch(ilens), self._put_batch(durs),
                    durations is not None, rng,
                    jnp.float32(d_factor))
        fn = self._fn(B, Tmax, budget, warm_args=dev_args)

        t0 = time.perf_counter()
        out = fn(*dev_args)
        return {"out": out, "t0": t0, "n": n, "B": B, "Tmax": Tmax,
                "budget": budget, "dev_args": dev_args,
                "predicted": durations is None}

    def _consume(self, pend):
        """Block on a pending batch; returns (mels, stats)."""
        out = pend["out"]
        n, budget = pend["n"], pend["budget"]
        mel = np.asarray(out["mel"])  # blocks
        olens = np.asarray(out["olens"])
        wall = time.perf_counter() - pend["t0"]

        # never return truncated mels (the reference can never truncate —
        # exact per-utterance shapes, tts.py:655-674): when predicted
        # durations exceed the heuristic frame budget, the EXACT need is
        # now known from d_outs, so transparently re-dispatch once at the
        # exact bucket.  At most one extra pass: d_outs don't depend on
        # the budget.
        redispatched = 0
        while pend["predicted"] and int((olens[:n] >= budget).sum()):
            need = int(np.asarray(out["d_outs"])[:n].sum(axis=1).max())
            new_budget = _round_up(need, self.frame_bucket)
            if new_budget <= budget:
                break  # budget boundary hit exactly; nothing was dropped
            budget = new_budget
            redispatched += 1
            fn = self._fn(pend["B"], pend["Tmax"], budget,
                          warm_args=pend["dev_args"])
            t0 = time.perf_counter()
            out = fn(*pend["dev_args"])
            mel = np.asarray(out["mel"])
            olens = np.asarray(out["olens"])
            wall = time.perf_counter() - t0

        mels = [mel[i, :olens[i]] for i in range(n)]
        total_frames = int(olens[:n].sum())
        fps = total_frames / wall if wall > 0 else float("inf")
        return mels, {"frames_per_sec": fps, "wall_sec": wall,
                      "total_frames": total_frames,
                      "truncated": 0, "redispatched": redispatched}

    def synth_batch(self, token_lists: List[np.ndarray], rng,
                    durations: Optional[List[np.ndarray]] = None,
                    d_factor: float = 1.0):
        """Synthesize a batch of token sequences; returns (mels, speeds).

        mels: list of (L_i, odim) float32; speeds: frames/sec per utterance
        measured over the whole batch call (wall clock includes D2H).
        """
        return self._consume(self._dispatch(token_lists, rng,
                                            durations=durations,
                                            d_factor=d_factor))

    def synth_manifest(self, utts: List[Utterance], out_dir,
                       write_ark=True, rng=None, label="decode",
                       use_gt_durations=False, d_factor=1.0):
        """Decode a manifest shard; returns mean frames/sec.

        Writes feats.ark/feats.scp (PWG-compatible) and <label>.txt with the
        speed summary (reference writes '<exp>.txt', tts.py:676-684).
        ``use_gt_durations`` feeds corpus durations instead of the
        predictor (the reference's dur= control knob,
        e2e_tts_tacotron2_sa.py:642-646)."""
        from fcl_taco2_tpu.data.manifest import load_features

        os.makedirs(out_dir, exist_ok=True)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        writer = ArkScpWriter(os.path.join(out_dir, "feats.ark"),
                              os.path.join(out_dir, "feats.scp")) \
            if write_ark else None
        speeds = []
        utt_lines = []
        total_frames = 0
        t_start = time.perf_counter()

        def finish(chunk, pend):
            mels, stats = self._consume(pend)
            speeds.append(stats["frames_per_sec"])
            # per-utterance speed lines (reference logs one per utt,
            # tts.py:665-674); decode here is batched so each line
            # carries the utterance's frames over its batch's wall —
            # the distribution exposes straggler buckets
            for u, m in zip(chunk, mels):
                fps_u = (m.shape[0] / stats["wall_sec"]
                         if stats["wall_sec"] > 0 else float("inf"))
                utt_lines.append(
                    f"{u.uttid} frames {m.shape[0]} "
                    f"batch_wall_sec {stats['wall_sec']:.4f} "
                    f"frames_per_sec {fps_u:.1f}\n")
            if writer:
                for u, m in zip(chunk, mels):
                    writer.write(u.uttid, m)
            return stats["total_frames"]

        # 1-deep pipeline: batch k+1 is DISPATCHED (async) before batch k
        # is read back, so device compute overlaps host readback/IO — per-
        # batch wall stays honest (dispatch -> readback-complete), total
        # throughput gains the overlap
        pending = None
        try:
            for i in range(0, len(utts), self.batch_size):
                chunk = utts[i:i + self.batch_size]
                rng, sub = jax.random.split(rng)
                durs = None
                if use_gt_durations:
                    durs = [load_features(u)[1] for u in chunk]
                disp = self._dispatch([u.tokenids for u in chunk], sub,
                                      durations=durs, d_factor=d_factor)
                if pending is not None:
                    total_frames += finish(*pending)
                pending = (chunk, disp)
            if pending is not None:
                total_frames += finish(*pending)
        finally:
            if writer:
                writer.close()
        total_wall = time.perf_counter() - t_start
        mean_fps = float(np.mean(speeds)) if speeds else 0.0
        total_fps = total_frames / total_wall if total_wall > 0 else 0.0
        with open(os.path.join(out_dir, f"{label}.txt"), "w") as f:
            f.writelines(utt_lines)
            f.write(f"mean_frames_per_sec {mean_fps:.1f}\n")
            f.write(f"total_frames_per_sec {total_fps:.1f}\n")
            if speeds:  # batch-throughput distribution (p50/p95)
                f.write("p50_frames_per_sec "
                        f"{float(np.percentile(speeds, 50)):.1f}\n")
                f.write("p95_frames_per_sec "
                        f"{float(np.percentile(speeds, 95)):.1f}\n")
        return mean_fps
