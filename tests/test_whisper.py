"""Whisper (first audio family): HF torch-parity for the encoder (conv
stem + sinusoid positions), teacher-forced logits, and KV-cached greedy
decode vs HF generate; plus a training smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from np_modeling_tpu import models, training
from np_modeling_tpu.utils import hf_compat

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

rng = np.random.default_rng(61)
FRAMES = 40          # encoder positions = 20


def _tiny_hf(seed=0):
    cfg = transformers.WhisperConfig(
        vocab_size=97, num_mel_bins=8, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=FRAMES // 2, max_target_positions=32,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        activation_function="gelu",
        decoder_start_token_id=1, pad_token_id=0, eos_token_id=2,
        begin_suppress_tokens=None, suppress_tokens=None,
        forced_decoder_ids=None)
    torch.manual_seed(seed)
    model = transformers.WhisperForConditionalGeneration(cfg)
    model.eval()
    return model


def test_whisper_encoder_and_logits_match_torch():
    model = _tiny_hf()
    cfg, params = hf_compat.import_whisper(model)
    assert cfg.n_mels == 8 and cfg.num_audio_positions == FRAMES // 2
    ours = models.Whisper(cfg)

    mel = rng.standard_normal((2, 8, FRAMES)).astype(np.float32)
    tgt = rng.integers(0, 97, (2, 7))
    with torch.no_grad():
        enc = model.model.encoder(torch.tensor(mel)).last_hidden_state
        out = model(input_features=torch.tensor(mel),
                    decoder_input_ids=torch.tensor(tgt)).logits
    mel_ours = jnp.asarray(mel.transpose(0, 2, 1))    # time-major
    got_enc = np.asarray(ours.encode(params, mel_ours))
    np.testing.assert_allclose(got_enc, enc.numpy(), rtol=1e-4, atol=2e-4)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(ours.apply(params, mel_ours, jnp.asarray(tgt)))
    np.testing.assert_allclose(got, out.numpy(), rtol=1e-4, atol=5e-4)


def test_whisper_greedy_decode_matches_full_forward():
    """KV-cached greedy decode == argmax of the full teacher-forced
    forward at every step (the forward itself is HF-parity above; HF's
    own Whisper ``generate`` additionally applies logits processors —
    suppress/forced tokens — so raw argmax is the right oracle here)."""
    model = _tiny_hf(seed=1)
    cfg, params = hf_compat.import_whisper(model)
    ours = models.Whisper(cfg)
    mel = jnp.asarray(rng.standard_normal((1, 8, FRAMES)), jnp.float32)
    mel = jnp.swapaxes(mel, 1, 2)
    prompt = np.array([1], np.int32)
    steps = 7
    got = np.asarray(ours.greedy_decode(params, mel, prompt, steps=steps))[0]
    cur = jnp.asarray(prompt)[None]
    for t in range(steps):
        nxt = int(jnp.argmax(ours.apply(params, mel, cur)[0, -1]))
        assert nxt == got[t], (t, nxt, got)
        cur = jnp.concatenate([cur, jnp.full((1, 1), nxt, cur.dtype)], 1)


def test_whisper_trains():
    cfg = models.WhisperConfig(
        vocab_size=64, n_mels=8, num_audio_positions=FRAMES // 2,
        max_target_positions=16, d_model=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=1, d_ff=64)
    ours = models.Whisper(cfg)
    mel = jnp.asarray(rng.standard_normal((2, FRAMES, 8)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 64, (2, 9)))
    params = ours.init(jax.random.PRNGKey(0), mel, tgt)
    opt = training.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(lambda q: ours.loss(q, mel, tgt))(p)
        u, s = opt.update(g, s, p)
        return training.apply_updates(p, u), s, loss

    p, losses = params, []
    for _ in range(10):
        p, st, l = step(p, st)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_log_mel_matches_hf_extractor():
    """Raw waveform -> log-mel features == transformers'
    WhisperFeatureExtractor (itself 1e-5-equal to the original torch)."""
    from np_modeling_tpu.models.audio import log_mel_spectrogram
    audio = (rng.standard_normal((2, 48000)) * 0.1).astype(np.float32)
    fe = transformers.WhisperFeatureExtractor(feature_size=8)
    want = fe(list(audio), sampling_rate=16000, return_tensors="np",
              padding=False, do_normalize=False).input_features
    got = np.asarray(log_mel_spectrogram(audio, n_mels=8))
    np.testing.assert_allclose(got, want.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)


def test_whisper_end_to_end_from_raw_audio():
    """Raw audio -> our log-mel -> our encoder == HF extractor -> HF
    encoder: the full speech path with no external preprocessing."""
    from np_modeling_tpu.models.audio import log_mel_spectrogram
    model = _tiny_hf(seed=2)
    cfg, params = hf_compat.import_whisper(model)
    ours = models.Whisper(cfg)
    audio = (rng.standard_normal((1, FRAMES * 160)) * 0.1).astype(np.float32)
    fe = transformers.WhisperFeatureExtractor(feature_size=8)
    mel_hf = fe(list(audio), sampling_rate=16000, return_tensors="np",
                padding=False, do_normalize=False).input_features
    with torch.no_grad():
        want = model.model.encoder(
            torch.tensor(mel_hf)).last_hidden_state.numpy()
    mel_ours = log_mel_spectrogram(audio, n_mels=8)
    got = np.asarray(ours.encode(params, mel_ours))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def _tiny_ours(seed=0, dec_layers=2):
    cfg = models.WhisperConfig(
        vocab_size=64, n_mels=8, num_audio_positions=FRAMES // 2,
        max_target_positions=40, d_model=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=dec_layers, d_ff=64)
    ours = models.Whisper(cfg)
    mel = jnp.asarray(rng.standard_normal((2, FRAMES, 8)), jnp.float32)
    params = ours.init(jax.random.PRNGKey(seed), mel,
                       jnp.zeros((2, 4), jnp.int32))
    return ours, params, mel


def _seq_logprob(ours, params, mel, prompt, toks):
    """Teacher-forced total log-probability of ``toks`` after ``prompt``."""
    full = jnp.concatenate([jnp.broadcast_to(prompt[None],
                                             (mel.shape[0],
                                              prompt.shape[0])),
                            toks], axis=1)
    logits = ours.apply(params, mel, full)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pos = jnp.arange(toks.shape[1]) + prompt.shape[0] - 1
    rows = lp[:, pos]                        # logits predicting toks
    return jnp.sum(jnp.take_along_axis(rows, toks[:, :, None],
                                       axis=-1)[..., 0], axis=1)


def test_whisper_beam1_matches_greedy():
    ours, params, mel = _tiny_ours()
    prompt = jnp.asarray([1, 5])
    g = ours.greedy_decode(params, mel, prompt, steps=6)
    seqs, _ = ours.beam_decode(params, mel, prompt, steps=6, beam_size=1)
    np.testing.assert_array_equal(np.asarray(seqs[:, 0]), np.asarray(g))


def test_whisper_beam_logprob_geq_greedy():
    """VERDICT r3 #7: beam >= greedy by the model's own sequence
    log-probability (teacher-forced rescoring as the oracle)."""
    ours, params, mel = _tiny_ours(seed=3)
    prompt = jnp.asarray([1, 5])
    g = ours.greedy_decode(params, mel, prompt, steps=6)
    seqs, scores = ours.beam_decode(params, mel, prompt, steps=6,
                                    beam_size=4)
    lp_greedy = _seq_logprob(ours, params, mel, prompt, g)
    best = seqs[:, 0]
    lp_beam = _seq_logprob(ours, params, mel, prompt, best)
    assert np.all(np.asarray(lp_beam) >= np.asarray(lp_greedy) - 1e-4), (
        lp_beam, lp_greedy)
    # beam_search's internal scores equal the teacher-forced rescoring.
    np.testing.assert_allclose(np.asarray(scores[:, 0]),
                               np.asarray(lp_beam), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("beam", [1, 3])
def test_whisper_transcribe_long_stitches(beam):
    """Long-form: audio spanning 2.5 windows is chunked to the 30s-window
    convention (last window zero-padded), each window's decode equals the
    same window decoded alone, and the stitched stream concatenates the
    EOS-truncated windows."""
    ours, params, _ = _tiny_ours(seed=5)
    prompt = jnp.asarray([1, 5])
    frames = FRAMES * 2 + FRAMES // 2            # 2.5 windows
    mel = jnp.asarray(rng.standard_normal((frames, 8)), jnp.float32)
    EOS_ID = 2
    stitched, per_window = ours.transcribe_long(
        params, mel, prompt, steps=6, beam_size=beam, eos_id=EOS_ID)
    assert len(per_window) == 3
    assert stitched == [t for w in per_window for t in w]
    # Window 1 decoded alone == window 1 inside the batched long-form call.
    w1 = mel[FRAMES:2 * FRAMES][None]
    if beam == 1:
        alone = np.asarray(ours.greedy_decode(params, w1, prompt,
                                              steps=6))[0].tolist()
    else:
        s, _ = ours.beam_decode(params, w1, prompt, steps=6, beam_size=beam,
                                eos_id=EOS_ID)
        alone = np.asarray(s[0, 0]).tolist()
    if EOS_ID in alone:
        alone = alone[:alone.index(EOS_ID)]
    assert per_window[1] == alone
