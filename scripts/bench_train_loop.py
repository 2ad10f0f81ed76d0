#!/usr/bin/env python3
"""Real training-loop throughput: run the actual Trainer (the cli/fcl_train
path) on the synthetic corpus on TPU and reconcile its in-loop step time
against bench.py's chained-in-jit device step time, measured on a REAL
converted batch of the same shapes.

VERDICT r03 finding #1: bench.py records ~28 ms/step, but the only
committed end-to-end wall number implied ~2.7 s/step
(results/MCD_e2e.json).  This measurement attributes the gap: the Trainer
now persists a per-epoch wall breakdown (train/loop.py loop_stats /
log.jsonl: loader wait, step dispatch, metric fetch, eval, checkpoint,
plot, compile) and this script summarizes the steady state vs the pure
device step.

Writes results/TRAIN_loop.json.

Usage: python scripts/bench_train_loop.py [--epochs 6] [--n-utts 480] ...
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe_link(sz_mb=64):
    """Measure the host<->device link: single-stream D2H vs chunked-
    concurrent D2H vs H2D.  The D2H asymmetry (one stream ~16 MB/s,
    16+ concurrent chunks ~42 MB/s on the axon relay) is what
    utils/device.device_get_chunked_async exploits for checkpoints."""
    import jax
    import numpy as np2

    from fcl_taco2_tpu.utils.device import (device_get_chunked,
                                            warmup_transfers)

    warmup_transfers()
    n = sz_mb * (1 << 18)  # fp32 elements
    big = jax.jit(lambda k: jax.random.normal(k, (n,)))(
        jax.random.PRNGKey(0))
    np2.asarray(big[:1])
    t0 = time.perf_counter()
    np2.asarray(big)
    t_one = time.perf_counter() - t0
    fresh = jax.jit(lambda k: jax.random.normal(k, (n,)))(
        jax.random.PRNGKey(1))  # host-value cache defeats re-fetch of big
    np2.asarray(fresh[:1])
    t0 = time.perf_counter()
    device_get_chunked(fresh)
    t_chunk = time.perf_counter() - t0
    h = np2.asarray(np2.random.default_rng(0).normal(size=(n // 4,)),
                    np2.float32)
    t0 = time.perf_counter()
    np2.asarray(jax.device_put(h)[:1])
    t_h2d = time.perf_counter() - t0
    return {
        "size_mb": sz_mb,
        "d2h_single_stream_mb_s": round(sz_mb / t_one, 1),
        "d2h_chunked_mb_s": round(sz_mb / t_chunk, 1),
        "h2d_mb_s": round(sz_mb / 4 / t_h2d, 1),
    }


def device_step_ms(trainer, ts, batch, n=20):
    """bench.py's chained-in-jit protocol on a REAL converted batch: n
    steps inside one fori_loop, completion forced by a host readback
    (block_until_ready is untrustworthy over the axon relay)."""
    import jax
    import jax.numpy as jnp

    from bench import _device_time
    from fcl_taco2_tpu.train.step import make_train_step

    step_raw = make_train_step(trainer.model, trainer.tx, trainer.mesh,
                               donate=False)

    @jax.jit
    def steps_loop(ts, batch, key):
        def body(i, carry):
            ts, _ = carry
            ts2, report = step_raw(ts, batch, jax.random.fold_in(key, i))
            return (ts2, report["loss"])

        return jax.lax.fori_loop(0, n, body, (ts, jnp.float32(0.0)))

    np.asarray(steps_loop(ts, batch, jax.random.PRNGKey(0))[1])  # compile
    reps = iter(range(100))
    dt = _device_time(
        lambda: steps_loop(ts, batch, jax.random.PRNGKey(next(reps)))[1], n)
    return dt * 1e3


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=str, default="/tmp/fcl_trainloop")
    p.add_argument("--n-utts", type=int, default=480)
    p.add_argument("--n-val", type=int, default=40)
    p.add_argument("--n-test", type=int, default=40)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=137)
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "results", "TRAIN_loop.json"))
    args = p.parse_args(argv)

    from cli import fcl_preprocess
    from cli.fcl_train import (get_parser, infer_idim_odim,
                               model_config_from_args,
                               train_config_from_args)
    from fcl_taco2_tpu.audio.synthcorpus import generate_corpus
    from fcl_taco2_tpu.utils.cliconf import parse_with_configs

    wd = args.workdir
    corpus = os.path.join(wd, "corpus")
    feat = os.path.join(wd, "features")
    exp = os.path.join(wd, "exp_teacher")

    if not os.path.exists(os.path.join(feat, "train_data.json")):
        print(f"[1/3] generating {args.n_utts}-utterance corpus ...",
              flush=True)
        generate_corpus(corpus, n_utts=args.n_utts, seed=7, log=print)
        print("[2/3] preprocessing ...", flush=True)
        fcl_preprocess.main([
            "--data-root", corpus, "--feature-root", feat,
            "--textgrid-root", os.path.join(corpus, "tg"),
            "--n-val", str(args.n_val), "--n-test", str(args.n_test),
            "--seed", "1"])

    print(f"[3/3] training the 512-d teacher for {args.epochs} epochs "
          "(instrumented) ...", flush=True)
    targs = parse_with_configs(get_parser(), [
        "--train-json", os.path.join(feat, "train_data.json"),
        "--valid-json", os.path.join(feat, "val_data.json"),
        "--outdir", exp, "--perform-KD", "False",
        "--epochs", str(args.epochs),
        "--batch-size", str(args.batch_size),
        "--seed", str(args.seed), "--n-devices", "1"])
    targs.remat_decoder = False  # fcl_train default for plain training

    import jax

    from fcl_taco2_tpu.data import load_manifest
    from fcl_taco2_tpu.models import Tacotron2SA
    from fcl_taco2_tpu.train.loop import Trainer

    idim, odim = infer_idim_odim(targs.valid_json)
    train_utts = load_manifest(targs.train_json)
    val_utts = load_manifest(targs.valid_json)
    model = Tacotron2SA(model_config_from_args(targs, idim, odim))
    tcfg = train_config_from_args(targs)
    tcfg.checkpoint_on_signal = False  # library use here

    link = probe_link()
    print(f"link probe: {json.dumps(link)}", flush=True)
    t0 = time.time()
    trainer = Trainer(model, tcfg, train_utts, val_utts)
    setup_s = time.time() - t0
    t0 = time.time()
    ts = trainer.run()
    train_wall = time.time() - t0

    stats = trainer.loop_stats
    total_steps = sum(e["steps"] for e in stats)
    # steady state = epochs after the first (epoch 0 carries the step +
    # eval compiles)
    all_steady = stats[1:] if len(stats) > 1 else stats
    # the axon relay sporadically stalls for tens of seconds mid-epoch
    # (a 91 s hiccup was observed inside a 1.9 s epoch); those seconds
    # are link weather, not loop overhead, so exclude epochs whose
    # train wall exceeds 3x the median and record them explicitly
    walls = sorted(e["train_wall_s"] for e in all_steady)
    med_wall = walls[len(walls) // 2]
    steady = [e for e in all_steady if e["train_wall_s"] <= 3 * med_wall]
    stall_epochs = [
        {"epoch": e["epoch"],
         "train_wall_s": round(e["train_wall_s"], 2),
         "excess_s": round(e["train_wall_s"] - med_wall, 2)}
        for e in all_steady if e["train_wall_s"] > 3 * med_wall]
    sd_steps = sum(e["steps"] for e in steady)

    def tot(key, eps=steady):
        return sum(e.get(key, 0.0) for e in eps)

    steady_summary = {
        "epochs": len(steady),
        "steps": sd_steps,
        "epoch_wall_s_mean": round(
            (tot("train_wall_s") + tot("eval_s") + tot("ckpt_s")
             + tot("plot_s")) / max(len(steady), 1), 3),
        "in_loop_step_ms": round(tot("train_wall_s") / sd_steps * 1e3, 2),
        "per_step_ms": {
            "dispatch": round(tot("dispatch_s") / sd_steps * 1e3, 2),
            "metric_fetch": round(tot("fetch_s") / sd_steps * 1e3, 2),
            "loader_wait": round(tot("loader_wait_s") / sd_steps * 1e3, 2),
            # loop wall not covered by the buckets above (e.g. python
            # iteration, reporter bookkeeping, sub-threshold link jitter)
            "unattributed": round(
                max(0.0, tot("train_wall_s") - tot("dispatch_s")
                    - tot("fetch_s") - tot("loader_wait_s"))
                / sd_steps * 1e3, 2),
        },
        "stall_epochs_excluded": stall_epochs,
        "per_epoch_s": {
            "train_loop": round(tot("train_wall_s") / len(steady), 3),
            "eval": round(tot("eval_s") / len(steady), 3),
            "checkpoint": round(tot("ckpt_s") / len(steady), 3),
            "checkpoint_bg": round(tot("ckpt_bg_s") / len(steady), 3),
            "plot": round(tot("plot_s") / len(steady), 3),
        },
        "loader_hidden_s_per_epoch": {
            "convert": round(tot("loader_convert_s") / len(steady), 3),
            "h2d_put": round(tot("loader_put_s") / len(steady), 3),
        },
    }
    amortized_ms = (steady_summary["epoch_wall_s_mean"] * 1e3 /
                    (sd_steps / len(steady)))

    # pure device step on the same shapes (the bench protocol)
    print("measuring the chained-in-jit device step on a real batch ...",
          flush=True)
    batches = trainer._epoch_batches(0)
    loader = trainer._loader(batches[:1], train=True)
    real_batch = next(iter(loader))
    dev_ms = device_step_ms(trainer, ts, real_batch)

    payload = {
        "protocol": {
            "corpus": f"{args.n_utts}-utt synthetic corpus "
                      "(audio/synthcorpus.py), same protocol as MCD_e2e",
            "model": "FCL-taco2-T teacher, bf16, duration-classed scans "
                     "(fcl_train defaults)",
            "epochs": args.epochs, "batch_size": args.batch_size,
            "eval/save/plot interval": "every epoch (the MCD_e2e run's "
                                       "configuration)",
            "backend": jax.default_backend(),
            "timing": "Trainer-internal perf_counter breakdown "
                      "(train/loop.py loop_stats); device step via "
                      "bench.py chained-in-jit protocol on a real "
                      "converted batch",
        },
        "link_probe": link,
        "trainer_setup_s": round(setup_s, 1),
        "total_train_wall_s": round(train_wall, 1),
        "first_epoch": {
            "wall_s": round(stats[0]["train_wall_s"] + stats[0]["eval_s"]
                            + stats[0]["ckpt_s"] + stats[0]["plot_s"], 2),
            "step_compile_s": round(stats[0]["first_iter_s"], 2),
        },
        "steady_state": steady_summary,
        "amortized_step_ms": round(amortized_ms, 1),
        "device_step_ms_chained": round(dev_ms, 2),
        "in_loop_over_device_ratio": round(
            steady_summary["in_loop_step_ms"] / dev_ms, 2),
        "epochs_detail": stats,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if os.path.exists(args.out):
        # keep the previous run for before/after comparison (e.g. the
        # pre-fix run that exposed the 117 s/epoch checkpoint fetch)
        with open(args.out) as f:
            prev = json.load(f)
        prev.pop("epochs_detail", None)
        prev.pop("previous_run", None)
        payload["previous_run"] = prev
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({k: v for k, v in payload.items()
                      if k != "epochs_detail"}, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
