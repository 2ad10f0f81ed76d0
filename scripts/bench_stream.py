"""Streaming TTS latency benchmark -> results/STREAM_tts.json.

Measures time-to-first-audio (TTFA) and steady-state RTF of
infer.stream.StreamTTS (student acoustic model + streaming PWG) on the
real TPU.  No reference counterpart exists (the reference decodes whole
utterances then vocodes in a separate process, tts.py:605-687): this is
the latency-facing serving mode the FCL architecture enables.

Timing: wall-clock around generator yields.  Each yield IS a completed
np.asarray readback, so no block_until_ready is involved (the relay
gotcha); TTFA includes the frontend's duration readback and all compile
-warm dispatch overhead — it is the honest "call to first sample" time
a server would see, including the axon relay's ~30 ms D2H RTT.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def measure(st, tokens, dur, key, trials=10):
    ttfas, rtfs, totals = [], [], []
    for t in range(trials):
        t0 = time.perf_counter()
        ttfa = None
        n = 0
        first = 0
        nchunks = 0
        for chunk in st.stream(tokens, jax.random.fold_in(key, t),
                               durations=dur):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
                first = chunk.size
            n += chunk.size
            nchunks += 1
        dt = time.perf_counter() - t0
        audio = n / 22050.0
        ttfas.append(ttfa)
        rtfs.append(dt / audio)
        totals.append(dt)
    med = lambda a: float(np.median(a))  # noqa: E731
    return {"ttfa_ms_p50": round(med(ttfas) * 1e3, 1),
            "ttfa_ms_min": round(float(np.min(ttfas)) * 1e3, 1),
            "rtf_p50": round(med(rtfs), 4),
            "x_realtime_p50": round(1.0 / med(rtfs), 1),
            "total_s_p50": round(med(totals), 3),
            "first_chunk_samples": int(first),
            "audio_s": round(n / 22050.0, 2),
            "n_wav_chunks": nchunks}


def main():
    from fcl_taco2_tpu.utils.device import warmup_transfers
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.models.config import student_config
    from fcl_taco2_tpu.vocoder.pwg import PWGConfig, pwg_init
    from fcl_taco2_tpu.infer.stream import StreamTTS

    IDIM, ODIM = 45, 80
    cfg = student_config(idim=IDIM, odim=ODIM, compute_dtype="bfloat16")
    model = Tacotron2SA(cfg)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    pwg_cfg = PWGConfig()
    pwg = jax.jit(lambda k: pwg_init(k, pwg_cfg))(jax.random.PRNGKey(1))
    warmup_transfers()

    st = StreamTTS(model, params, state, pwg, pwg_cfg)
    rng = np.random.default_rng(0)
    out = {"platform": jax.default_backend(),
           "config": {"chunk_phonemes": st.Pc, "postnet_chunk": st.Fc,
                      "vocode_frames": st.Fv, "tile": st.tile,
                      "hop": st.hop, "vocoder_delay_samples": st.delay,
                      "vocoder_delay_ms": round(st.delay / 22.05, 1),
                      "readback_depth": st.readback_depth,
                      "model": "student-256 bf16 + PWG fp32"},
           "timing": "wall-clock around generator yields; every yield "
                     "is a completed host readback (includes relay "
                     "~30ms D2H RTT per chunk)"}
    for name, n_phones in [("short_utt_16ph", 16),
                           ("typical_utt_64ph", 64),
                           ("long_utt_192ph", 192)]:
        tokens = rng.integers(1, IDIM, n_phones).astype(np.int32)
        dur = np.clip(rng.poisson(5.0, n_phones), 1,
                      cfg.max_dur).astype(np.int32)
        # warm-up (compiles for this budget bucket)
        st.tts(tokens, jax.random.PRNGKey(42), durations=dur)
        out[name] = measure(st, tokens, dur, jax.random.PRNGKey(7))
        out[name]["n_phones"] = n_phones
        out[name]["n_frames"] = int(dur.sum())
        print(name, out[name], flush=True)

    # teacher streaming: each phoneme chunk is a single kernel tile, so
    # the decode rides the HBM weight-streaming kernel — the path int8
    # weight-only quantization accelerates (half the DMA bytes/step)
    from fcl_taco2_tpu.models.config import teacher_config
    tcfg = teacher_config(idim=IDIM, odim=ODIM, compute_dtype="bfloat16")
    tmodel = Tacotron2SA(tcfg)
    tparams, tstate = jax.jit(tmodel.init)(jax.random.PRNGKey(2))
    t_tokens = rng.integers(1, IDIM, 64).astype(np.int32)
    t_dur = np.clip(rng.poisson(5.0, 64), 1, tcfg.max_dur).astype(np.int32)
    for name, q in (("teacher_utt_64ph", "none"),
                    ("teacher_utt_64ph_int8", "int8")):
        stt = StreamTTS(tmodel, tparams, tstate, pwg, pwg_cfg, quantize=q)
        stt.tts(t_tokens, jax.random.PRNGKey(42), durations=t_dur)
        out[name] = measure(stt, t_tokens, t_dur, jax.random.PRNGKey(7))
        out[name]["n_phones"] = 64
        out[name]["n_frames"] = int(t_dur.sum())
        # the top-level config block describes the STUDENT runs
        out[name]["model"] = ("teacher-1024 bf16 (HBM weight-streaming "
                              f"decode kernel), quantize={q}")
        print(name, out[name], flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "STREAM_tts.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
