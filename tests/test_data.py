"""Data pipeline tests: preprocessing, bucketing, padding (SURVEY.md §4.1)."""

import os

import numpy as np
import pytest

from tacotron_multispeaker_tpu.config import get_config
from tacotron_multispeaker_tpu.data.feeder import (Feeder, PrefetchIterator,
                                                   pad_axis, pick_bucket)
from tacotron_multispeaker_tpu.data.preprocess import (CORPORA, load_metadata,
                                                       write_metadata)
from tacotron_multispeaker_tpu.data.synthetic import make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    cfg = get_config("tiny", "train.batch_size=4,train.batches_per_group=2")
    base = tmp_path_factory.mktemp("corpus")
    corp = make_corpus(str(base / "raw"), n_utts=10, n_speakers=2,
                       sample_rate=cfg.audio.sample_rate)
    out = str(base / "training")
    md = CORPORA["generic"](corp, out, cfg.audio, num_workers=1)
    write_metadata(md, out, cfg.audio)
    return cfg, out


def test_preprocess_outputs(corpus):
    cfg, out = corpus
    rows = load_metadata(os.path.join(out, "train.txt"))
    assert len(rows) == 10
    speakers = {r["speaker_id"] for r in rows}
    assert speakers == {0, 1}
    r0 = rows[0]
    mel = np.load(os.path.join(out, r0["mel_file"]))
    lin = np.load(os.path.join(out, r0["linear_file"]))
    assert mel.shape == (r0["n_frames"], cfg.audio.num_mels)
    assert lin.shape == (r0["n_frames"], cfg.audio.num_freq)
    assert 0.0 <= mel.min() and mel.max() <= 1.0


def test_pad_axis():
    x = np.ones((3, 2))
    assert pad_axis(x, 5).shape == (5, 2)
    assert pad_axis(x, 2).shape == (2, 2)
    assert (pad_axis(x, 5)[3:] == 0).all()


def test_pick_bucket():
    assert pick_bucket(10, (100, 200)) == 100
    assert pick_bucket(150, (100, 200)) == 200
    assert pick_bucket(999, (100, 200)) == 200


def test_feeder_static_shapes(corpus):
    cfg, out = corpus
    feeder = Feeder(out, cfg)
    r = cfg.model.outputs_per_step
    seen = set()
    in_buckets = set(cfg.train.input_bucket_boundaries) | \
        {cfg.train.max_input_length}
    for batch in feeder.epoch_batches(0):
        B, L = batch.inputs.shape
        assert B == cfg.train.batch_size
        assert L in in_buckets
        assert batch.input_lengths.max() <= L
        T = batch.mel_targets.shape[1]
        assert T % r == 0
        assert T in feeder.boundaries
        assert batch.linear_targets.shape == (B, T, cfg.audio.num_freq)
        assert batch.target_lengths.max() <= T
        assert batch.speaker_ids.shape == (B,)
        seen.add((B, L, T))
    # small fixed set of jit signatures
    assert len(seen) <= len(feeder.boundaries) * len(in_buckets)


def test_feeder_bf16_targets(corpus):
    """train.targets_dtype=bfloat16 (round 4): the feeder ships half-width
    targets — the dominant host→device input bandwidth — and a train step
    through them matches the f32-target loss to ~1e-4 relative (target
    quantization ~0.2% of the [0,1] range, far below the loss floor)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_train_step)

    cfg, out = corpus
    cfg16 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, targets_dtype="bfloat16"))
    b32 = next(iter(Feeder(out, cfg).epoch_batches(0)))
    b16 = next(iter(Feeder(out, cfg16).epoch_batches(0)))
    assert b16.mel_targets.dtype == ml_dtypes.bfloat16
    assert b16.linear_targets.dtype == ml_dtypes.bfloat16
    assert b16.mel_targets.nbytes * 2 == b32.mel_targets.nbytes
    # same underlying values up to bf16 rounding
    assert np.abs(b16.mel_targets.astype(np.float32)
                  - b32.mel_targets).max() < 4e-3

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model))
    args32 = (jnp.asarray(b32.inputs), jnp.asarray(b32.input_lengths),
              jnp.asarray(b32.mel_targets), jnp.asarray(b32.linear_targets),
              jnp.asarray(b32.target_lengths), jnp.asarray(b32.speaker_ids))
    args16 = (jnp.asarray(b16.inputs), jnp.asarray(b16.input_lengths),
              jnp.asarray(b16.mel_targets), jnp.asarray(b16.linear_targets),
              jnp.asarray(b16.target_lengths), jnp.asarray(b16.speaker_ids))
    _, m32 = step(state, *args32)
    _, m16 = step(state, *args16)
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / l32 < 1e-3, (l32, l16)


def test_feeder_host_sharding(corpus):
    """Multi-host DP slicing: per-host batches concatenate to the global
    batch with identical bucket shapes (the metadata-only plan agrees)."""
    cfg, out = corpus
    glob = Feeder(out, cfg, process_index=0, process_count=1)
    h0 = Feeder(out, cfg, process_index=0, process_count=2)
    h1 = Feeder(out, cfg, process_index=1, process_count=2)
    for bg, b0, b1 in zip(glob.epoch_batches(0), h0.epoch_batches(0),
                          h1.epoch_batches(0)):
        half = cfg.train.batch_size // 2
        assert b0.inputs.shape[0] == b1.inputs.shape[0] == half
        # identical bucket shapes across hosts
        assert b0.inputs.shape == b1.inputs.shape
        assert b0.mel_targets.shape == b1.mel_targets.shape
        # concatenation reproduces the global batch
        assert (np.concatenate([b0.inputs, b1.inputs]) == bg.inputs).all()
        assert np.allclose(np.concatenate([b0.mel_targets, b1.mel_targets]),
                           bg.mel_targets)
        assert (np.concatenate([b0.speaker_ids, b1.speaker_ids])
                == bg.speaker_ids).all()


def test_feeder_deterministic(corpus):
    cfg, out = corpus
    f1 = Feeder(out, cfg)
    f2 = Feeder(out, cfg)
    b1 = next(iter(f1.epoch_batches(0)))
    b2 = next(iter(f2.epoch_batches(0)))
    assert (b1.inputs == b2.inputs).all()
    assert np.allclose(b1.mel_targets, b2.mel_targets)
    # different epoch → different order
    b3 = next(iter(f1.epoch_batches(1)))
    assert not (b1.inputs == b3.inputs).all()


def test_feeder_bucket_homogeneity(corpus):
    """Within a batch, lengths are similar (group-sorted bucketing)."""
    cfg, out = corpus
    feeder = Feeder(out, cfg, shuffle=False)
    for batch in feeder.epoch_batches(0):
        spread = batch.target_lengths.max() - batch.target_lengths.min()
        # sorted groups keep the spread modest for the synthetic corpus
        assert spread <= max(batch.target_lengths.max() // 2, 40)


def test_feeder_cmudict_host_invariant(corpus, tmp_path):
    """cmudict substitution must not depend on the process count: per-row
    rngs are keyed on the GLOBAL row index (VERDICT r2 weak #7 — a per-batch
    stream consumed over each host's slice broke this)."""
    cfg, out = corpus
    # cover every synthetic-corpus word so substitutions actually fire
    cmu = tmp_path / "cmudict"
    words = ["THE", "QUICK", "BROWN", "FOX", "JUMPS", "OVER", "LAZY", "DOG",
             "PACK", "MY", "BOX", "WITH", "FIVE", "DOZEN", "LIQUOR", "JUGS",
             "HOW", "VEXINGLY", "DAFT", "ZEBRAS"]
    cmu.write_text("".join(f"{w}  HH AH0 L OW1\n" for w in words))
    import dataclasses as dc
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, cmudict_prob=0.5))
    mk = lambda pi, pc: Feeder(out, cfg, cmudict_path=str(cmu),
                               process_index=pi, process_count=pc)
    glob_batches = list(mk(0, 1).epoch_batches(0))
    h0_batches = list(mk(0, 2).epoch_batches(0))
    h1_batches = list(mk(1, 2).epoch_batches(0))
    for bg, b0, b1 in zip(glob_batches, h0_batches, h1_batches):
        merged = np.concatenate([b0.inputs, b1.inputs])
        assert (merged == bg.inputs).all()
    # sanity: the augmentation actually fired (vs a cmudict-off feeder)
    plain_batches = list(Feeder(out, cfg).epoch_batches(0))
    assert any(not (bg.inputs == bp.inputs).all()
               for bg, bp in zip(glob_batches, plain_batches))


def test_prefetch_iterator(corpus):
    cfg, out = corpus
    feeder = Feeder(out, cfg)
    it = PrefetchIterator(feeder.epoch_batches(0), prefetch=2)
    batches = list(it)
    assert len(batches) >= 1
    it.close()


def test_prefetch_propagates_errors():
    def boom():
        yield 1
        raise RuntimeError("feeder died")

    it = PrefetchIterator(boom(), prefetch=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="feeder died"):
        next(it)


def test_encode_text_roundtrip(corpus):
    cfg, out = corpus
    feeder = Feeder(out, cfg)
    ids = feeder.encode_text("hello world")
    assert ids.dtype == np.int32
    assert len(ids) > 5


def test_grain_pipeline_batches(corpus):
    """grain-backed loader yields the same static-shape contract."""
    pytest.importorskip("grain")
    from tacotron_multispeaker_tpu.data.grain_pipeline import grain_batches
    cfg, out = corpus
    it = grain_batches(out, cfg, num_epochs=1, shard_by_process=False)
    batches = list(it)
    assert len(batches) >= 1
    r = cfg.model.outputs_per_step
    for b in batches:
        assert b.inputs.shape == (cfg.train.batch_size,
                                  cfg.train.max_input_length)
        assert b.mel_targets.shape[1] % r == 0
        assert b.mel_targets.shape[2] == cfg.audio.num_mels


def test_grain_global_batches_multihost(corpus):
    """Round-3 weak-#9 fix: the grain pipeline over the Feeder's global
    batch plan serves multi-host training — per-host streams have identical
    static shapes and concatenate to the single-host Feeder's batches."""
    pytest.importorskip("grain")
    from tacotron_multispeaker_tpu.data.grain_pipeline import (
        grain_global_batches)
    cfg, out = corpus
    ref = list(Feeder(out, cfg, process_index=0,
                      process_count=1).epoch_batches(0))
    g0 = grain_global_batches(out, cfg, num_epochs=1,
                              process_index=0, process_count=2)
    g1 = grain_global_batches(out, cfg, num_epochs=1,
                              process_index=1, process_count=2)
    n = 0
    for bg, b0, b1 in zip(ref, g0, g1):
        assert b0.inputs.shape == b1.inputs.shape      # no cross-host skew
        assert b0.mel_targets.shape == b1.mel_targets.shape
        assert (np.concatenate([b0.inputs, b1.inputs]) == bg.inputs).all()
        assert np.allclose(np.concatenate([b0.mel_targets, b1.mel_targets]),
                           bg.mel_targets)
        assert (np.concatenate([b0.speaker_ids, b1.speaker_ids])
                == bg.speaker_ids).all()
        n += 1
    assert n == len(ref) >= 1


def test_grain_global_batches_workers(corpus):
    """worker_count>0 (multiprocess materialization) is deterministic and
    equal to the in-process stream."""
    pytest.importorskip("grain")
    from tacotron_multispeaker_tpu.data.grain_pipeline import (
        grain_global_batches)
    cfg, out = corpus
    inproc = list(grain_global_batches(out, cfg, num_epochs=1))
    workers = list(grain_global_batches(out, cfg, num_epochs=1,
                                        worker_count=2))
    assert len(inproc) == len(workers)
    for a, b in zip(inproc, workers):
        assert (a.inputs == b.inputs).all()
        assert np.allclose(a.mel_targets, b.mel_targets)
        assert np.allclose(a.linear_targets, b.linear_targets)


def test_native_batcher_matches_numpy(corpus):
    """C++ threaded .npy batch assembly == the pure-numpy path."""
    from tacotron_multispeaker_tpu.data import native_batcher
    if not native_batcher.available():
        pytest.skip(f"native batcher unavailable: {native_batcher.build_error()}")
    cfg, out = corpus
    f_py = Feeder(out, cfg, use_native=False)
    f_cc = Feeder(out, cfg, use_native=True)
    b_py = next(iter(f_py.epoch_batches(0)))
    b_cc = next(iter(f_cc.epoch_batches(0)))
    assert (b_py.inputs == b_cc.inputs).all()
    assert (b_py.target_lengths == b_cc.target_lengths).all()
    assert np.allclose(b_py.mel_targets, b_cc.mel_targets)
    assert np.allclose(b_py.linear_targets, b_cc.linear_targets)


def test_native_batcher_npy_rows(corpus):
    from tacotron_multispeaker_tpu.data import native_batcher
    if not native_batcher.available():
        pytest.skip("native batcher unavailable")
    cfg, out = corpus
    rows = load_metadata(os.path.join(out, "train.txt"))
    r0 = rows[0]
    path = os.path.join(out, r0["mel_file"])
    assert native_batcher.npy_rows(path, cfg.audio.num_mels) == r0["n_frames"]
    # wrong column count rejected
    assert native_batcher.npy_rows(path, 13) == -1


def test_thchs30_builder(tmp_path):
    """THCHS-30 layout: wav + .wav.trn pairs, toned-pinyin transcripts,
    speaker id from the filename prefix (SURVEY.md §2.4 fork corpora)."""
    from tacotron_multispeaker_tpu.audio import AudioProcessor
    from tacotron_multispeaker_tpu.text import sequence_to_text, text_to_sequence

    cfg = get_config("tiny")
    proc = AudioProcessor(cfg.audio)
    raw = tmp_path / "data_thchs30" / "data"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    utts = [("A11_0", "lv4 shi4 yang2 chun1"), ("A11_1", "ta1 jin3 ping2"),
            ("B8_0", "yi2 ge4 ren2")]
    for utt, pinyin in utts:
        wav = (rng.randn(cfg.audio.sample_rate // 4) * 0.1).astype(np.float32)
        proc.save_wav(wav, str(raw / f"{utt}.wav"))
        (raw / f"{utt}.wav.trn").write_text(f"汉字\n{pinyin}\nl v4 sh i4\n")
    out = str(tmp_path / "training")
    md = CORPORA["thchs30"](str(tmp_path / "data_thchs30"), out, cfg.audio,
                            num_workers=1)
    write_metadata(md, out, cfg.audio)
    rows = load_metadata(os.path.join(out, "train.txt"))
    assert len(rows) == 3
    by_text = {r["text"]: r["speaker_id"] for r in rows}
    assert by_text["lv4 shi4 yang2 chun1"] == 0    # speaker A11
    assert by_text["yi2 ge4 ren2"] == 1            # speaker B8
    # tone digits survive the text frontend round-trip (basic_cleaners)
    seq = text_to_sequence("yang2 chun1", ["basic_cleaners"])
    assert sequence_to_text(seq).rstrip("~") == "yang2 chun1"


def test_thchs30_pointer_trns_and_limit(tmp_path):
    """Released-corpus train/ dirs hold one-line pointer trns to
    ../data/*.trn — the builder follows them; ``limit`` counts ACCEPTED
    utterances and speakers.txt covers only emitted speakers."""
    from tacotron_multispeaker_tpu.audio import AudioProcessor

    cfg = get_config("tiny")
    proc = AudioProcessor(cfg.audio)
    root = tmp_path / "data_thchs30"
    data, train = root / "data", root / "train"
    data.mkdir(parents=True)
    train.mkdir()
    rng = np.random.RandomState(0)
    utts = [("A11_0", "lv4 shi4"), ("A11_1", "ta1 jin3"),
            ("B8_0", "yi2 ge4"), ("C4_0", "ren2 men5")]
    for utt, pinyin in utts:
        wav = (rng.randn(cfg.audio.sample_rate // 8) * 0.1).astype(np.float32)
        (data / f"{utt}.wav.trn").write_text(f"汉字\n{pinyin}\nphones\n")
        # train/ has the wav and a one-line pointer trn
        proc.save_wav(wav, str(train / f"{utt}.wav"))
        (train / f"{utt}.wav.trn").write_text(f"../data/{utt}.wav.trn\n")
    # a trn whose wav is missing must NOT consume the limit budget
    (train / "A11_9.wav.trn").write_text("../data/A11_0.wav.trn\n")
    out = str(tmp_path / "training")
    md = CORPORA["thchs30"](str(train), out, cfg.audio, num_workers=1,
                            limit=3)
    write_metadata(md, out, cfg.audio)
    rows = load_metadata(os.path.join(out, "train.txt"))
    assert len(rows) == 3          # exactly `limit` accepted utterances
    with open(os.path.join(out, "speakers.txt")) as f:
        speakers = [ln.split("|")[1].strip() for ln in f if ln.strip()]
    # ids derived from emitted utterances only (C4 fell past the limit)
    assert speakers == sorted({"A11", "B8"})
    # empty result raises instead of silently writing nothing
    empty = root / "empty"
    empty.mkdir()
    (empty / "X1_0.wav.trn").write_text("../nowhere.trn\n")
    with pytest.raises((ValueError, FileNotFoundError)):
        CORPORA["thchs30"](str(empty), str(tmp_path / "t2"), cfg.audio,
                           num_workers=1)


@pytest.fixture(scope="module")
def corpus_wav(tmp_path_factory):
    """Corpus preprocessed with --keep_wavs (round 5: targets_from_wav)."""
    cfg = get_config("tiny", "train.batch_size=4,train.batches_per_group=2")
    base = tmp_path_factory.mktemp("corpus_wav")
    corp = make_corpus(str(base / "raw"), n_utts=8, n_speakers=2,
                       sample_rate=cfg.audio.sample_rate)
    out = str(base / "training")
    md = CORPORA["generic"](corp, out, cfg.audio, num_workers=1,
                            keep_wavs=True)
    write_metadata(md, out, cfg.audio)
    return cfg, out


def test_spectrogram_targets_matches_offline(corpus_wav):
    """dsp.spectrogram_targets (the in-graph window-support-DFT analysis the
    targets_from_wav step runs) reproduces the offline rfft-based
    spectrogram/melspectrogram pair on the exact same waveform."""
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.audio import AudioProcessor, dsp
    from tacotron_multispeaker_tpu.data.preprocess import wav_file_for

    cfg, out = corpus_wav
    rows = load_metadata(os.path.join(out, "train.txt"))
    r0 = rows[0]
    pcm = np.load(os.path.join(out, wav_file_for(r0)))
    assert pcm.dtype == np.int16
    wav = pcm.astype(np.float32) / 32768.0
    ap = AudioProcessor(cfg.audio)
    lin_ref = ap.spectrogram(wav).T            # [T, bins]
    mel_ref = ap.melspectrogram(wav).T         # [T, M]
    params = dsp.STFTParams.from_config(cfg.audio)
    mel, lin = dsp.spectrogram_targets(
        jnp.asarray(wav), params, sample_rate=cfg.audio.sample_rate,
        num_mels=cfg.audio.num_mels, preemph=cfg.audio.preemphasis,
        ref_level_db=cfg.audio.ref_level_db,
        min_level_db=cfg.audio.min_level_db, n_frames=r0["n_frames"])
    assert np.asarray(lin).shape == lin_ref.shape
    # near-floor bins amplify f32 DFT-vs-rfft rounding through log10 (a
    # ~1e-6 magnitude delta on a ~1e-5 magnitude is ~1 dB there), so the
    # max is bounded loosely while the bulk must match tightly
    dlin = np.abs(np.asarray(lin) - lin_ref)
    dmel = np.abs(np.asarray(mel) - mel_ref)
    assert dlin.max() < 0.01 and dmel.max() < 0.01
    # synthetic formant audio is spectrally sparse, so a sizable bin
    # fraction sits at the floor — the bulk bound uses the 90th pct
    assert np.percentile(dlin, 90) < 2e-4
    assert np.percentile(dmel, 90) < 2e-4


def test_feeder_targets_from_wav_shapes(corpus_wav):
    import dataclasses as dc
    cfg, out = corpus_wav
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, targets_from_wav=True))
    feeder = Feeder(out, cfg)
    batch = next(iter(feeder))
    B = cfg.train.batch_size
    hop = cfg.audio.hop_length
    assert batch.mel_targets.dtype == np.int16
    T_wav = batch.mel_targets.shape[1]
    assert T_wav % hop == 0 and T_wav // hop in feeder.boundaries
    assert batch.linear_targets.size == 0
    assert batch.target_lengths.max() <= T_wav // hop


def test_targets_from_wav_step_matches_precomputed(corpus_wav):
    """VERDICT r4 Missing #4 gate: the wav-ingest train step's loss matches
    the precomputed-target step within a small tolerance (residual = the
    padded-tail edge frames: the offline STFT reflect-pads the true signal
    end, the batched wav reflects into its zero padding)."""
    import dataclasses as dc
    import jax
    from tacotron_multispeaker_tpu.training import (create_train_state,
                                                    make_train_step)

    cfg_pre, out = corpus_wav
    cfg_pre = get_config(
        "tiny", "train.batch_size=4,train.batches_per_group=2,"
        "model.prenet_dropout=0.0,model.compute_dtype=float32")
    cfg_wav = dc.replace(cfg_pre,
                         train=dc.replace(cfg_pre.train,
                                          targets_from_wav=True))
    f_pre = Feeder(out, cfg_pre, shuffle=False)
    f_wav = Feeder(out, cfg_wav, shuffle=False)
    entry = f_pre.epoch_plan(0)[0]
    b_pre = f_pre.materialize(entry)
    b_wav = f_wav.materialize(entry)
    assert (b_pre.target_lengths == b_wav.target_lengths).all()

    model, state = create_train_state(cfg_pre, jax.random.PRNGKey(0))
    args = lambda b: (b.inputs, b.input_lengths, b.mel_targets,
                      b.linear_targets, b.target_lengths, b.speaker_ids)
    _, m_pre = jax.jit(make_train_step(cfg_pre, model))(state, *args(b_pre))
    _, m_wav = jax.jit(make_train_step(cfg_wav, model))(state, *args(b_wav))
    l_pre, l_wav = float(m_pre["loss"]), float(m_wav["loss"])
    assert np.isfinite(l_wav)
    assert abs(l_wav - l_pre) / l_pre < 2e-3, (l_pre, l_wav)


def test_targets_from_wav_shard_map_matches_unsharded(corpus_wav):
    """Composition gate: the wav-ingest step inside the shard_map DP route
    (8-device mesh, PCM batch sharded over data) matches the unsharded
    wav-ingest step — target derivation is per-example, so sharding
    commutes with it."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.parallel import make_mesh
    from tacotron_multispeaker_tpu.training import (
        create_train_state, make_sharded_train_step, make_train_step)

    cfg = get_config(
        "tiny", "train.batch_size=8,train.batches_per_group=2,"
        "model.prenet_dropout=0.0,model.compute_dtype=float32,"
        "parallel.bn_cross_replica=true")
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, targets_from_wav=True))
    _, out = corpus_wav
    feeder = Feeder(out, cfg, shuffle=False)
    b = feeder.materialize(feeder.epoch_plan(0)[0])
    model, state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    args = (jnp.asarray(b.inputs), jnp.asarray(b.input_lengths),
            jnp.asarray(b.mel_targets), jnp.asarray(b.linear_targets),
            jnp.asarray(b.target_lengths), jnp.asarray(b.speaker_ids))
    mesh = make_mesh(cfg.parallel, data=8, model=1)
    s1, m1 = jax.jit(make_train_step(cfg, model))(
        *jax.device_put((state0, *args), mesh.devices.flat[0]))
    step_fn, state_sh = make_sharded_train_step(cfg, model, mesh)(state0)
    s2, m2 = step_fn(jax.device_put(state0, state_sh), *args)
    assert np.allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # per-shard [1,·] vs batched [8,·] DFT derive differs in the last ulp
    # (reduction reassociation); Adam's sqrt-normalization amplifies those
    # target deltas into ≤4e-5 param deltas at step 1 — tolerance covers
    # that, the loss (pre-Adam) still matches to 1e-5
    for a, bb in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        assert np.allclose(np.asarray(a), np.asarray(bb), atol=2e-4)


def test_spectrogram_targets_precision_high_close(corpus_wav):
    """train.wav_dft_precision=high (bf16x3 DFT, ~2x cheaper) stays within
    the same tolerance envelope as HIGHEST on normalized-dB targets."""
    import jax
    import jax.numpy as jnp
    from tacotron_multispeaker_tpu.audio import dsp
    from tacotron_multispeaker_tpu.data.preprocess import wav_file_for

    cfg, out = corpus_wav
    r0 = load_metadata(os.path.join(out, "train.txt"))[0]
    wav = np.load(os.path.join(out, wav_file_for(r0))).astype(np.float32) \
        / 32768.0
    params = dsp.STFTParams.from_config(cfg.audio)
    kw = dict(sample_rate=cfg.audio.sample_rate, num_mels=cfg.audio.num_mels,
              preemph=cfg.audio.preemphasis,
              ref_level_db=cfg.audio.ref_level_db,
              min_level_db=cfg.audio.min_level_db, n_frames=r0["n_frames"])
    mel_hst, lin_hst = dsp.spectrogram_targets(
        jnp.asarray(wav), params, precision=jax.lax.Precision.HIGHEST, **kw)
    mel_hi, lin_hi = dsp.spectrogram_targets(
        jnp.asarray(wav), params, precision=jax.lax.Precision.HIGH, **kw)
    # on the real MXU, HIGH (bf16x3) puts a few dB on near-floor bins
    # (log10 amplifies the bf16 residual there); the bulk stays ~1e-3 of
    # the dB range.  On CPU HIGH lowers to plain f32 dots.
    # (the synthetic formant audio is spectrally sparse, so even the 90th
    # pct sits near the floor on chip — measured 4.3e-3 there)
    max_tol, bulk_tol = ((0.08, 1e-2) if jax.default_backend() == "tpu"
                         else (0.02, 1e-3))
    assert np.abs(np.asarray(lin_hi) - np.asarray(lin_hst)).max() < max_tol
    assert np.percentile(
        np.abs(np.asarray(lin_hi) - np.asarray(lin_hst)), 90) < bulk_tol
    assert np.abs(np.asarray(mel_hi) - np.asarray(mel_hst)).max() < max_tol
