"""On-device (JAX) train-time augmentations.

Device-side counterpart of :mod:`audio_to_midi_tpu.data.augment` — the same
nine transforms (python.rs:566-932 semantics), expressed as one jitted batch
transform under ``jax.random`` so augmentation can run on the TPU, overlapped
with the training step, instead of on the (single-core) host.

Semantics notes:
  * each transform applies ``int(p * batch)`` times to uniformly-drawn items
    (with replacement), sequentially — repeated draws compound, exactly like
    the reference's loops;
  * the RNG *sequence* differs from both the Rust and numpy host paths (JAX
    threefry vs mt19937) — distributions match, streams don't, which is fine
    for training;
  * transforms that need dynamic spans (cut_mix, erase) use arange masks, and
    rotate uses dynamic-shift rolls — everything stays statically shaped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import TransformSettings


def _n_apps(prob: float, batch: int) -> int:
    return int(prob * batch)


def _span_mask(n: int, lo, hi):
    """Boolean mask over [0, n) for traced bounds [lo, hi)."""
    ar = jnp.arange(n)
    return (ar >= lo) & (ar < hi)


def _apply_n(n_apps: int, fn, carry, key):
    if n_apps <= 0:
        return carry
    keys = jax.random.split(key, n_apps)

    def body(c, k):
        return fn(c, k), None

    carry, _ = jax.lax.scan(body, carry, keys)
    return carry


@partial(jax.jit, static_argnames=("settings",))
def transform_for_training_device(
    audio: jax.Array, labels: jax.Array, settings: TransformSettings, key: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """audio (B, 2, N) f32, labels (B, F, K) f32 -> augmented copies."""
    b, _, n = audio.shape
    f, k_keys = labels.shape[1], labels.shape[2]
    (
        k_pan, k_switch, k_cut, k_rot, k_erase, k_mix, k_gain, k_noise,
    ) = jax.random.split(key, 8)

    pan_prob = (
        settings.channel_switch_probability
        if settings.parity_pan_uses_channel_switch_probability
        else settings.pan_probability
    )

    # pan (python.rs:721-750)
    def pan_once(audio, k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (), 0, b)
        item = audio[idx]
        eps = 0.01
        lempty = jnp.all(jnp.abs(item[0]) < eps)
        rempty = jnp.all(jnp.abs(item[1]) < eps)
        pf = jax.random.uniform(k2)
        gains = jnp.stack(
            [jnp.minimum(2.0 * (1.0 - pf), 1.0), jnp.minimum(2.0 * pf, 1.0)]
        )
        new = jnp.where(lempty | rempty, item, item * gains[:, None])
        return audio.at[idx].set(new)

    audio = _apply_n(_n_apps(pan_prob, b), pan_once, audio, k_pan)

    # channel switch (python.rs:707-719)
    def switch_once(audio, k):
        idx = jax.random.randint(k, (), 0, b)
        return audio.at[idx].set(audio[idx][::-1])

    audio = _apply_n(
        _n_apps(settings.channel_switch_probability, b), switch_once, audio, k_switch
    )

    # cut mix (python.rs:566-623)
    def cut_once(carry, k):
        audio, labels = carry
        k1, k2, k3, k4 = jax.random.split(k, 4)
        a = jax.random.randint(k1, (), 0, b)
        bb = jax.random.randint(k2, (), 0, b)
        min_cut = 0.01
        cs = jax.random.uniform(k3, minval=0.0, maxval=1.0 - min_cut)
        cl = jax.random.uniform(k4, minval=min_cut, maxval=1.0 - cs)
        am = _span_mask(n, (cs * n).astype(jnp.int32), ((cs + cl) * n).astype(jnp.int32))
        fm = _span_mask(f, (cs * f).astype(jnp.int32), ((cs + cl) * f).astype(jnp.int32))
        new_audio = jnp.where(am[None, :], audio[bb], audio[a])
        new_labels = jnp.where(fm[:, None], labels[bb], labels[a])
        return (audio.at[a].set(new_audio), labels.at[a].set(new_labels))

    audio, labels = _apply_n(
        _n_apps(settings.cut_probability, b), cut_once, (audio, labels), k_cut
    )

    # rotate (python.rs:683-705)
    def rot_once(carry, k):
        audio, labels = carry
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (), 0, b)
        roll = jax.random.uniform(k2)
        ar = (roll * n).astype(jnp.int32)
        fr = (roll * f).astype(jnp.int32)
        audio = audio.at[idx].set(jnp.roll(audio[idx], ar, axis=1))
        labels = labels.at[idx].set(jnp.roll(labels[idx], fr, axis=0))
        return (audio, labels)

    audio, labels = _apply_n(
        _n_apps(settings.rotate_probability, b), rot_once, (audio, labels), k_rot
    )

    # random erasing (python.rs:752-777)
    def erase_once(audio, k):
        k1, k2, k3 = jax.random.split(k, 3)
        idx = jax.random.randint(k1, (), 0, b)
        min_e, max_e = 0.01, 0.10
        es = jax.random.uniform(k2, minval=0.0, maxval=1.0 - min_e)
        el = jax.random.uniform(k3, minval=min_e, maxval=jnp.minimum(max_e, 1.0 - es))
        mask = _span_mask(n, (es * n).astype(jnp.int32), ((es + el) * n).astype(jnp.int32))
        return audio.at[idx].set(jnp.where(mask[None, :], 0.0, audio[idx]))

    audio = _apply_n(
        _n_apps(settings.random_erasing_probability, b), erase_once, audio, k_erase
    )

    # mixup (python.rs:625-681): lambda ~ Beta(2,2), labels elementwise max
    def mix_once(carry, k):
        audio, labels = carry
        k1, k2, k3 = jax.random.split(k, 3)
        a = jax.random.randint(k1, (), 0, b)
        bb = jax.random.randint(k2, (), 0, b)
        lam = jax.random.beta(k3, 2.0, 2.0)
        audio = audio.at[a].set(lam * audio[a] + (1.0 - lam) * audio[bb])
        labels = labels.at[a].set(jnp.maximum(labels[a], labels[bb]))
        return (audio, labels)

    audio, labels = _apply_n(
        _n_apps(settings.mixup_probability, b), mix_once, (audio, labels), k_mix
    )

    # gain (python.rs:779-798)
    def gain_once(audio, k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (), 0, b)
        g = jnp.clip(1.0 + 0.25 * jax.random.normal(k2), 0.5, 1.5)
        return audio.at[idx].multiply(g)

    audio = _apply_n(_n_apps(settings.gain_probability, b), gain_once, audio, k_gain)

    # noise (python.rs:800-820)
    def noise_once(audio, k):
        k1, k2, k3 = jax.random.split(k, 3)
        idx = jax.random.randint(k1, (), 0, b)
        sigma = jax.random.uniform(k2, minval=0.0, maxval=0.25)
        return audio.at[idx].add(sigma * jax.random.normal(k3, (2, n)))

    audio = _apply_n(_n_apps(settings.noise_probability, b), noise_once, audio, k_noise)

    # --- timbre-perturbing extensions (no reference counterpart; all OFF by
    # default — see config.TransformSettings).  Label-preserving: linear
    # filtering / amplitude shaping never moves onsets or pitches.
    if (
        settings.eq_probability > 0
        or settings.dynamics_warp_probability > 0
        or settings.am_jitter_probability > 0
    ):
        k_eq, k_dyn, k_am = jax.random.split(jax.random.fold_in(key, 77), 3)

        # random EQ: 128-tap FIR from a random smooth log-magnitude curve
        # H(f) = exp(sum_i a_i cos(pi i f/fn)), a_i ~ N(0, strength/i) —
        # a zero-mean random cepstrum, i.e. a gentle random tilt/ripple
        # reshaping the harmonic rolloff (timbre) without notching.
        taps = 128
        freqs = jnp.linspace(0.0, 1.0, taps // 2 + 1)

        def eq_once(audio, k):
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (), 0, b)
            orders = jnp.arange(1, 5, dtype=jnp.float32)
            coef = (
                jax.random.normal(k2, (4,))
                * settings.eq_strength / orders
            )
            log_mag = jnp.sum(
                coef[:, None] * jnp.cos(jnp.pi * orders[:, None] * freqs[None, :]),
                axis=0,
            )
            h = jnp.fft.irfft(jnp.exp(log_mag).astype(jnp.complex64), taps)
            h = jnp.roll(h, taps // 2)  # centered (linear-phase-ish) kernel
            pad = taps // 2
            x = jnp.pad(audio[idx], ((0, 0), (pad, pad - 1)))
            y = jax.vmap(lambda ch: jnp.convolve(ch, h, mode="valid"))(x)
            return audio.at[idx].set(y)

        audio = _apply_n(_n_apps(settings.eq_probability, b), eq_once, audio, k_eq)

        # dynamics warp: local-RMS envelope (non-overlapping 256-sample
        # windows) raised to a random power gamma-1 scales the sample —
        # gamma < 1 compresses dynamics (softens attacks towards the
        # "sustained" family), gamma > 1 expands them.
        hop = 256
        nw = n // hop

        def dyn_once(audio, k):
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (), 0, b)
            gamma = jax.random.uniform(k2, minval=0.6, maxval=1.5)
            item = audio[idx]
            seg = item[:, : nw * hop].reshape(2, nw, hop)
            rms = jnp.sqrt(jnp.mean(seg**2, axis=-1) + 1e-8)  # (2, nw)
            scale = (rms / (jnp.max(rms, axis=-1, keepdims=True) + 1e-8)) ** (
                gamma - 1.0
            )
            scale_full = jnp.repeat(scale, hop, axis=-1)
            scale_full = jnp.pad(
                scale_full, ((0, 0), (0, n - nw * hop)), mode="edge"
            )
            return audio.at[idx].set(item * scale_full)

        audio = _apply_n(
            _n_apps(settings.dynamics_warp_probability, b), dyn_once, audio, k_dyn
        )

        # AM jitter: slow sinusoidal amplitude modulation, depth U(0, 0.4)
        # at U(2, 8) Hz — the tremolo bridge.  Sample rate is recovered from
        # the 5 s window length (n samples per MODEL_AUDIO_LENGTH seconds).
        t = jnp.arange(n, dtype=jnp.float32) / jnp.float32(n)

        def am_once(audio, k):
            k1, k2, k3, k4 = jax.random.split(k, 4)
            idx = jax.random.randint(k1, (), 0, b)
            depth = jax.random.uniform(k2, minval=0.0, maxval=0.4)
            cycles = jax.random.uniform(k3, minval=10.0, maxval=40.0)  # 2-8 Hz over 5 s
            phase = jax.random.uniform(k4, maxval=2.0 * jnp.pi)
            env = 1.0 - depth * 0.5 * (1.0 - jnp.cos(2 * jnp.pi * cycles * t + phase))
            return audio.at[idx].set(audio[idx] * env[None, :])

        audio = _apply_n(
            _n_apps(settings.am_jitter_probability, b), am_once, audio, k_am
        )

    # label smoothing (python.rs:822-836)
    alpha = settings.label_smoothing_alpha
    if alpha > 0:
        labels = jnp.clip(labels, alpha, 1.0 - alpha)

    return audio, labels
