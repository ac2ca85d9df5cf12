"""Integration: tiny config trains to decreasing loss, checkpoints, resumes,
and synthesizes (SURVEY.md §4.4) — on the fake 8-device CPU mesh (§4.5)."""

import glob
import os

import numpy as np
import pytest

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.data.preprocess import CORPORA, write_metadata
from tacotron_multispeaker_tpu.data.synthetic import make_corpus

OVERRIDES = ",".join([
    "train.batch_size=8", "train.batches_per_group=2",
    "train.summary_interval=5", "train.checkpoint_interval=8",
    "model.max_iters=10",
])


@pytest.fixture(scope="module")
def training_dir(tmp_path_factory):
    cfg = get_config("tiny", OVERRIDES)
    base = tmp_path_factory.mktemp("e2e")
    corp = make_corpus(str(base / "raw"), n_utts=16, n_speakers=1,
                       sample_rate=cfg.audio.sample_rate)
    out = str(base / "training")
    md = CORPORA["generic"](corp, out, cfg.audio, num_workers=1)
    write_metadata(md, out, cfg.audio)
    return cfg, str(base), out


@pytest.fixture(scope="module")
def trained(training_dir):
    from tacotron_multispeaker_tpu.train_loop import train
    cfg, base, data_dir = training_dir
    log_dir = os.path.join(base, "logs")
    res = train(log_dir, data_dir, cfg, max_steps=10)
    return cfg, base, data_dir, log_dir, res


def test_loss_decreases(trained):
    cfg, base, data_dir, log_dir, res = trained
    assert res["step"] == 10
    assert np.isfinite(res["loss"])
    # parse the train log for first/last loss
    with open(os.path.join(log_dir, "train.log")) as f:
        losses = [float(ln.split("loss=")[1].split()[0])
                  for ln in f if "loss=" in ln]
    assert losses[-1] < losses[0]


def test_checkpoint_artifacts(trained):
    cfg, base, data_dir, log_dir, res = trained
    assert glob.glob(os.path.join(log_dir, "checkpoints", "*"))
    assert glob.glob(os.path.join(log_dir, "step-8-align.png"))
    assert glob.glob(os.path.join(log_dir, "step-8-audio.wav"))


def test_resume_from_checkpoint(trained):
    from tacotron_multispeaker_tpu.train_loop import train
    cfg, base, data_dir, log_dir, res = trained
    res2 = train(log_dir, data_dir, cfg, max_steps=12, restore=True)
    assert res2["step"] == 12


def test_synthesize_from_checkpoint(trained):
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer
    cfg, base, data_dir, log_dir, res = trained
    syn = Synthesizer(cfg).load(os.path.join(log_dir, "checkpoints"))
    wavs, aligns = syn.synthesize_batch(["the quick brown fox", "hello"],
                                        max_iters=8)
    assert len(wavs) == 2
    for w in wavs:
        assert np.isfinite(w).all()
        assert len(w) > 0
    assert aligns.shape[0] == 2
    # wav bytes API
    b = syn.synthesize("hello world")
    assert b[:4] == b"RIFF"


def test_synthesize_deterministic(trained):
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer
    cfg, base, data_dir, log_dir, res = trained
    syn = Synthesizer(cfg).load(os.path.join(log_dir, "checkpoints"))
    w1, _ = syn.synthesize_batch(["determinism"], max_iters=6, seed=3)
    w2, _ = syn.synthesize_batch(["determinism"], max_iters=6, seed=3)
    assert np.allclose(w1[0], w2[0])


def test_sharded_synthesis(trained):
    """Pod-scale data-parallel decode (BASELINE config 5) on the fake mesh."""
    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer
    from tacotron_multispeaker_tpu.data.feeder import pad_axis
    from tacotron_multispeaker_tpu.text import text_to_sequence

    cfg, base, data_dir, log_dir, res = trained
    syn = Synthesizer(cfg).load(os.path.join(log_dir, "checkpoints"))
    mesh = make_mesh(cfg.parallel)  # 8 CPU devices
    B, L = 8, cfg.train.max_input_length
    fn = syn.make_sharded_synth(mesh, B, L, max_iters=4)
    texts = [f"sentence number {i}" for i in range(B)]
    seqs = [np.asarray(text_to_sequence(t, cfg.cleaners), np.int32)
            for t in texts]
    inputs = jnp.asarray(np.stack([pad_axis(s, L) for s in seqs]))
    lengths = jnp.asarray([len(s) for s in seqs], jnp.int32)
    sids = jnp.zeros((B,), jnp.int32)
    wav, aligns, mels = fn(syn.variables, inputs, lengths, sids,
                           jax.random.PRNGKey(0))
    assert wav.shape[0] == B
    assert np.isfinite(np.asarray(wav)).all()
    # batch outputs sharded over the data axis
    assert "data" in str(wav.sharding)


def test_demo_server_http(trained):
    """demo_server handler serves HTML and audio/wav over real HTTP."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import demo_server as ds
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer

    cfg, base, data_dir, log_dir, res = trained
    ds.Handler.synthesizer = Synthesizer(cfg).load(
        os.path.join(log_dir, "checkpoints"))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), ds.Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"<form" in html
        wav = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/synthesize?text=hi&speaker_id=0",
            timeout=600).read()
        assert wav[:4] == b"RIFF"
        # missing text → 400
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/synthesize", timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_validate_cli(trained, capsys, monkeypatch):
    """validate.py reports per-speaker and overall teacher-forced L1."""
    import json
    import sys
    import validate as validate_mod

    cfg, base, data_dir, log_dir, res = trained
    monkeypatch.setattr(sys, "argv", [
        "validate.py", "--checkpoint_dir", os.path.join(log_dir, "checkpoints"),
        "--data_dir", data_dir, "--preset", "tiny",
        "--hparams", OVERRIDES, "--limit", "8"])
    validate_mod.main()
    out = capsys.readouterr().out
    # trace-time kernel-disengage notices (infolog) may precede the JSON on
    # stdout (e.g. the BiGRU dims gate on chip); the machine contract is
    # --json_out, so here parse from the first brace
    report = json.loads(out[out.index("{"):])
    assert report["n_utterances"] >= 8
    assert 0.0 < report["overall"]["mel_l1"] < 1.0
    assert "0" in report["per_speaker"]


def test_train_with_grain_pipeline(training_dir, tmp_path):
    """train(pipeline="grain") runs the grain global-plan loader end to end
    and produces the same first-batch loss as the Feeder (same plan)."""
    pytest.importorskip("grain")
    from tacotron_multispeaker_tpu.train_loop import train
    cfg, base, data_dir = training_dir
    res_g = train(str(tmp_path / "logs_grain"), data_dir, cfg, max_steps=2,
                  restore=False, pipeline="grain")
    res_f = train(str(tmp_path / "logs_feeder"), data_dir, cfg, max_steps=2,
                  restore=False, pipeline="feeder")
    assert res_g["step"] == res_f["step"] == 2
    assert np.isclose(res_g["loss"], res_f["loss"]), (res_g, res_f)


@pytest.fixture(scope="module")
def trained_2speaker(tmp_path_factory):
    """A 300-step 2-speaker training run + restored variables + one batch —
    shared by the conditioning gate and the trained-spectrogram GL gate."""
    import jax
    from tacotron_multispeaker_tpu.data.feeder import Feeder
    from tacotron_multispeaker_tpu.train_loop import train
    from tacotron_multispeaker_tpu.training import create_train_state
    from tacotron_multispeaker_tpu.utils.checkpoint import CheckpointManager

    base = tmp_path_factory.mktemp("e2e_2spk")
    cfg = get_config("tiny", ",".join([
        "train.batch_size=8", "train.batches_per_group=2",
        "train.checkpoint_interval=1000", "train.summary_interval=100",
        "model.max_iters=10", "model.num_speakers=2",
        "model.speaker_embed_depth=8"]))
    corp = make_corpus(str(base / "raw"), n_utts=16, n_speakers=2,
                       sample_rate=cfg.audio.sample_rate,
                       min_words=2, max_words=3)
    out = str(base / "training")
    md = CORPORA["generic"](corp, out, cfg.audio, num_workers=1)
    write_metadata(md, out, cfg.audio)
    res = train(str(base / "logs"), out, cfg, max_steps=300, restore=False)
    assert res["step"] == 300

    model, template = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(str(base / "logs" / "checkpoints"))
    state = ckpt.restore(jax.device_get(template))
    ckpt.close()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = next(iter(Feeder(out, cfg).epoch_batches(0)))
    return cfg, model, variables, batch


def test_multispeaker_conditioning_effective(trained_2speaker):
    """Speaker-conditioning gate (VERDICT r2 Missing #5b): after a 300-step
    2-speaker training run, (a) teacher-forced mel L1 stays low PER SPEAKER,
    (b) swapping the speaker id changes the predicted mel by a margin, and
    (c) the true speaker id fits its own data better than the swapped one.
    Calibrated on this exact setup: per-speaker L1 0.066/0.070, swap diff
    0.0275, true 0.0699 vs swapped 0.0735 (margin stable at 300-900 steps)."""
    import jax
    import jax.numpy as jnp

    cfg, model, variables, batch = trained_2speaker

    def forward(sids):
        out_m = model.apply(variables, jnp.asarray(batch.inputs),
                            jnp.asarray(batch.input_lengths),
                            jnp.asarray(batch.mel_targets),
                            speaker_ids=jnp.asarray(sids), train=False,
                            rngs={"dropout": jax.random.PRNGKey(0)})
        return np.asarray(out_m.mel_outputs)

    mel_true = forward(batch.speaker_ids)
    mel_swap = forward(1 - batch.speaker_ids)
    # (a) per-speaker teacher-forced fit
    for sid in (0, 1):
        m = batch.speaker_ids == sid
        assert m.any()
        l1 = np.abs(mel_true[m] - batch.mel_targets[m]).mean()
        assert l1 < 0.12, f"speaker {sid}: mel L1 {l1}"
    # (b) the speaker id measurably changes the output
    diff = np.abs(mel_true - mel_swap).mean()
    assert diff > 0.008, f"speaker swap changed mel by only {diff}"
    # (c) conditioning points the right way
    true_l1 = np.abs(mel_true - batch.mel_targets).mean()
    swap_l1 = np.abs(mel_swap - batch.mel_targets).mean()
    assert swap_l1 > true_l1, (true_l1, swap_l1)


def test_griffin_lim_fast_default_on_trained_spectrograms(trained_2speaker):
    """GL quality gate on a TRAINED MODEL'S predicted linear spectrograms
    (VERDICT r2 weak #6 — previous gates used only synthetic audio): the
    fast default schedule (15 iters dft_mix, momentum 0.99) must reconstruct
    the model's own spectrogram at least as well as the exact reference
    formulation (60 plain f32 iterations)."""
    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.audio import AudioProcessor, dsp
    from tacotron_multispeaker_tpu.config import AudioConfig

    cfg, model, variables, batch = trained_2speaker
    out_m = model.apply(variables, jnp.asarray(batch.inputs),
                        jnp.asarray(batch.input_lengths),
                        jnp.asarray(batch.mel_targets),
                        speaker_ids=jnp.asarray(batch.speaker_ids),
                        train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    n_frames = int(batch.target_lengths[0])
    lin_pred = np.asarray(out_m.linear_outputs)[0, :n_frames].T  # [bins, T]

    ap = AudioProcessor(cfg.audio)
    params = dsp.STFTParams.from_config(cfg.audio)
    s = dsp.db_to_amp(dsp.denormalize_db(
        jnp.asarray(np.clip(lin_pred, 0.0, 1.0)),
        cfg.audio.min_level_db) + cfg.audio.ref_level_db)
    mag = jnp.power(s, cfg.audio.power)
    key = jax.random.PRNGKey(0)

    def recon_err(wav):
        lin2 = ap.spectrogram(np.asarray(wav))
        fr = min(lin_pred.shape[1], lin2.shape[1]) - 4
        return float(np.abs(lin_pred[:, 2:fr] - lin2[:, 2:fr]).mean())

    default_iters = AudioConfig().griffin_lim_iters
    fast = dsp.inv_preemphasis(
        dsp.griffin_lim(mag, params, default_iters, key, method="dft_mix",
                        momentum=0.99), cfg.audio.preemphasis)
    reference = dsp.inv_preemphasis(
        dsp.griffin_lim(mag, params, 60, key, method="dft_f32",
                        momentum=0.0), cfg.audio.preemphasis)
    assert np.isfinite(np.asarray(fast)).all()
    err_fast, err_ref = recon_err(fast), recon_err(reference)
    assert err_fast <= err_ref + 0.002, (err_fast, err_ref)


def test_attention_alignment_emerges_monotonic():
    """Alignment-quality gate (VERDICT r2 Missing #5a): train the full model
    on a micro copy-task — L random letters → one fixed target frame per
    letter (r=1) — with a FRESH random batch every step, so the decoder
    cannot memorize utterances and teacher-forced loss can only drop by
    reading the text through attention.  After 1200 steps the alignment
    argmax path must advance monotonically along the diagonal.

    Calibrated on this exact setup (CPU, fixed seeds): step 500 meanprog
    0.996 / span 1.0; step 1250 diag deviation 0.47 positions, backfrac 0.
    (Corpus-based probes are decoder-memorizable — tools/align_probe.py
    measured a 128-utterance synthetic corpus leaving attention uniform for
    20k steps — so the gate uses the unmemorizable task.)"""
    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_sharded_train_step)

    cfg = get_config("tiny", ",".join([
        "train.batch_size=16", "audio.num_mels=16", "audio.num_freq=33",
        "model.outputs_per_step=1", "train.warmup_steps=50",
        "train.bucket_boundaries=(16,)", "train.max_input_length=16",
        "train.input_bucket_boundaries=(16,)", "model.prenet_dropout=0.0",
        "model.postnet_proj_channels=(64,16)"]))
    B = cfg.train.batch_size
    L = T = 16  # r=1: one frame per input symbol
    rng = np.random.RandomState(0)
    proto_m = rng.rand(26, cfg.audio.num_mels).astype(np.float32)
    proto_l = rng.rand(26, cfg.audio.num_freq).astype(np.float32)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        letters = r.randint(0, 26, (B, L))
        return (jnp.asarray(letters + 2, jnp.int32),
                jnp.full((B,), L, jnp.int32),
                jnp.asarray(proto_m[letters]), jnp.asarray(proto_l[letters]),
                jnp.full((B,), T, jnp.int32), jnp.zeros((B,), jnp.int32))

    mesh = make_mesh(devices=jax.devices()[:1], data=1, model=1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state)
    state = jax.device_put(state, state_sh)
    first_mel = None
    for step in range(1, 1201):
        state, metrics = step_fn(state, *make_batch(step))
        if step == 50:
            first_mel = float(metrics["mel_loss"])
    last_mel = float(metrics["mel_loss"])
    # learning happened on unmemorizable data → text was read
    assert last_mel < first_mel - 0.02, (first_mel, last_mel)

    batch = make_batch(10**6)  # held-out fresh batch
    out = model.apply({"params": jax.device_get(state.params),
                       "batch_stats": jax.device_get(state.batch_stats)},
                      batch[0], batch[1], batch[2], train=False,
                      rngs={"dropout": jax.random.PRNGKey(0)})
    al = np.asarray(out.alignments)          # [B, T, L]
    path = al.argmax(-1)
    prog = np.diff(path, axis=1)
    meanprog = float(prog.mean())            # diagonal slope ≈ 1 (r=1, T=L)
    backfrac = float((prog < 0).mean())      # backward jumps
    span = float((path.max(1) - path.min(1)).mean()) / (L - 1)
    diagdev = float(np.abs(path - np.arange(T)[None, :]).mean())
    assert 0.8 < meanprog < 1.15, meanprog
    assert backfrac <= 0.05, backfrac
    assert span >= 0.85, span
    assert diagdev <= 1.5, diagdev


@pytest.mark.skipif(not os.environ.get("RUN_TPU_TESTS"),
                    reason="flagship-dims training gate: chip-only "
                           "(2000 full-size steps; hours on CPU)")
def test_flagship_alignment_on_chip():
    """VERDICT r3 Missing #2: the FULL ``single_speaker`` model (256-d,
    r=5, K=16 CBHG, 80 mel / 1025 linear, training kernels at their
    defaults) develops monotonic attention on the unmemorizable copy-task
    within 2000 on-chip steps.  Shares tools/flagship_align.run_probe so
    the executables hit the same persistent compile cache as the tool
    (measured round 4: meanprog 0.968, backfrac 0.0, span 0.968, diagdev
    0.97 at step 2000)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from flagship_align import run_probe
    last = run_probe(steps=2000, probe_every=2000, log=lambda m: None)
    assert 0.8 < last["meanprog"] < 1.15, last
    assert last["backfrac"] <= 0.05, last
    assert last["span"] >= 0.85, last
    assert last["diagdev"] <= 1.5, last


@pytest.mark.skipif(not os.environ.get("RUN_TPU_TESTS"),
                    reason="flagship-dims multispeaker gate: chip-only")
def test_flagship_multispeaker_on_chip():
    """Round-4 multispeaker capstone: the flagship model with a 4-speaker
    table trains the per-speaker copy-task (each speaker has its OWN
    letter→frames prototypes — loss can only reach the floor through the
    speaker embedding) and, by step 2000: monotonic alignment AND a wide
    true-vs-swapped-speaker margin (measured: true 0.047 / swapped 0.333,
    margin 0.287; BASELINE.md table)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from flagship_align import run_probe
    last = run_probe(steps=2000, probe_every=2000, num_speakers=4,
                     log=lambda m: None)
    assert 0.8 < last["meanprog"] < 1.15, last
    assert last["backfrac"] <= 0.05, last
    assert last["true_l1"] < 0.09, last
    assert last["swap_margin"] > 0.12, last


def test_memorization_dp_local_bn_reaches_loss_level(tmp_path):
    """Quality gate for the round-4 DP defaults (VERDICT r3 weak #1 /
    task 5): the same 300-step memorization train through the shard_map
    data-parallel step on the 8-device mesh — per-shard BatchNorm
    statistics (B_local=1!), per-shard dropout streams, psum'd grads —
    must reach the SAME loss level as the single-device gate (measured:
    0.187 total / 0.069 mel vs 0.188 / 0.070 single-device)."""
    import jax
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.train_loop import train

    cfg = get_config("tiny", ",".join([
        "train.batch_size=8", "train.batches_per_group=2",
        "train.checkpoint_interval=1000", "train.summary_interval=100",
        "model.max_iters=10"]))
    assert not cfg.parallel.bn_cross_replica    # the default under test
    corp = make_corpus(str(tmp_path / "raw"), n_utts=16, n_speakers=1,
                       sample_rate=cfg.audio.sample_rate,
                       min_words=2, max_words=3)
    out = str(tmp_path / "training")
    md = CORPORA["generic"](corp, out, cfg.audio, num_workers=2)
    write_metadata(md, out, cfg.audio)
    mesh = make_mesh(data=8, model=1)
    res = train(str(tmp_path / "logs"), out, cfg, max_steps=300,
                restore=False, mesh=mesh)
    assert res["step"] == 300
    assert res["loss"] < 0.25, res
    assert res["mel_loss"] < 0.12, res


def test_memorization_training_reaches_loss_level(tmp_path):
    """Meaningful-training gate (not just losses[-1] < losses[0]): 300
    steps on a 16-utterance synthetic corpus must reach memorization-level
    losses — total < 0.25 and teacher-forced mel L1 < 0.12 (measured:
    0.64 → 0.188 total, 0.070 mel)."""
    from tacotron_multispeaker_tpu.train_loop import train

    cfg = get_config("tiny", ",".join([
        "train.batch_size=8", "train.batches_per_group=2",
        "train.checkpoint_interval=1000", "train.summary_interval=100",
        "model.max_iters=10"]))
    corp = make_corpus(str(tmp_path / "raw"), n_utts=16, n_speakers=1,
                       sample_rate=cfg.audio.sample_rate,
                       min_words=2, max_words=3)
    out = str(tmp_path / "training")
    md = CORPORA["generic"](corp, out, cfg.audio, num_workers=2)
    write_metadata(md, out, cfg.audio)
    res = train(str(tmp_path / "logs"), out, cfg, max_steps=300,
                restore=False)
    assert res["step"] == 300
    assert res["loss"] < 0.25, res
    assert res["mel_loss"] < 0.12, res


def test_eval_bucket_grouping():
    """VERDICT r4 weak #4: eval.py groups sentences by serving bucket so
    the default sentence set compiles at most len(input_bucket_boundaries)
    executables and short sentences run the short bucket."""
    import eval as eval_cli
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer

    cfg = get_config("single_speaker")
    syn = Synthesizer(cfg)          # bucket logic needs no checkpoint
    groups = list(eval_cli.group_by_bucket(syn, eval_cli.SENTENCES, 8))
    buckets = {syn.serve_bucket_for(chunk) for _, chunk in groups}
    assert buckets <= set(cfg.train.input_bucket_boundaries) | {
        cfg.train.max_input_length}
    assert len(buckets) <= 2
    # the default sentences are all short -> everything fits the 96 bucket
    assert buckets == {96}
    # indices cover every sentence exactly once
    seen = sorted(i for idx, _ in groups for i in idx)
    assert seen == list(range(len(eval_cli.SENTENCES)))
    # a long sentence lands in a bigger bucket, separate group
    long = eval_cli.SENTENCES + ["word " * 40]
    groups2 = list(eval_cli.group_by_bucket(syn, long, 8))
    assert {syn.serve_bucket_for(c) for _, c in groups2} == {96, 192}


def test_serve_frames_per_char_scales_iters():
    """VERDICT r4 weak #7: model.serve_frames_per_char scales the serving
    decode length to the text; 0 (default) keeps reference semantics."""
    from tacotron_multispeaker_tpu.config import parse_overrides
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer

    cfg = get_config("single_speaker")
    syn = Synthesizer(cfg)
    assert syn._iters_for(10) == cfg.model.max_iters      # default: off
    cfg2 = parse_overrides(cfg, "model.serve_frames_per_char=7")
    syn2 = Synthesizer(cfg2)
    # 48 chars * 7 frames / r=5 = 68 steps -> quantized up to 75
    assert syn2._iters_for(48) == 75
    assert syn2._iters_for(192) == cfg.model.max_iters    # capped
    assert syn2._iters_for(1) == 25                       # quantum floor
    # the quantized variant count per bucket is bounded
    variants = {syn2._iters_for(n) for n in range(1, 193)}
    assert len(variants) <= 8


def test_serve_frames_per_char_end_to_end(trained):
    """Short-text synthesis through the scaled path produces a shorter
    (finite) wav and proportionally fewer alignment steps."""
    import dataclasses as dc
    from tacotron_multispeaker_tpu.synthesizer import Synthesizer

    cfg, base, data_dir, log_dir, res = trained
    cfg2 = dc.replace(cfg, model=dc.replace(cfg.model,
                                            serve_frames_per_char=4.0))
    syn = Synthesizer(cfg2).load(os.path.join(log_dir, "checkpoints"))
    wavs, aligns = syn.synthesize_batch(["hi the fox"], [0])
    full = cfg.model.max_iters
    assert aligns.shape[1] < full
    assert np.isfinite(wavs[0]).all()
    # default path unchanged
    syn0 = Synthesizer(cfg).load(os.path.join(log_dir, "checkpoints"))
    _, aligns0 = syn0.synthesize_batch(["hi the fox"], [0])
    assert aligns0.shape[1] == full
