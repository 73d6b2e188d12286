"""One-command real-weight conversion + parity harness.

Given a directory of published checkpoints, convert every backbone to its
JAX parameter pytree, embed a fixed deterministic signal with BOTH the
original torch model (the test-suite torch twins / reference backbone /
transformers, whichever oracle is available) and the converted JAX tower,
and write the measured embedding cosines to a JSON report. The instant an
environment carries real weights, this verifies the BASELINE "embedding
cosine within 1e-3 of reference" target end to end.

Expected checkpoint filenames (any subset may be present):

    afx-rep.ckpt             https://huggingface.co/csteinmetz1/afx-rep
    clap-htsat-unfused.pt    laion/clap-htsat-unfused state_dict (or the
                             HF model dir itself via --clap-hf-dir)
    BEATs_iter3.pt           microsoft BEATs release
    fxencoder.pt             jhtonyKoo/music_mixing_style_transfer
    Wav2CLIP.pt              descriptinc/lyrebird-wav2clip
    vggish.pth (+ vggish_pca_params.pth)   harritaylor/torchvggish

Reference loader surgery mirrored by the converters: st_ito/utils.py:511-608.

Usage:
    python scripts/convert_all.py --ckpt-dir checkpoints \
        --out examples/convert_report.json [--strict]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def _fixed_signal(sr: int = 48000, T: int = 131072) -> np.ndarray:
    rng = np.random.default_rng(1234)
    return (rng.standard_normal((2, T)) * 0.25).astype(np.float32)


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _entry(status: str, **kw) -> dict:
    return {"status": status, **kw}


# ------------------------------------------------------------------ afx-rep


def convert_afx_rep(path: str) -> dict:
    import torch

    from st_ito_tpu.models.convert import load_torch_checkpoint
    from st_ito_tpu.models.registry import ParamModel, get_param_embeds
    from torch_cnn14_twin import TorchCnn14Twin

    params, config = load_torch_checkpoint(path)
    model = ParamModel(params=jax.tree.map(jnp.asarray, params), config=config,
                       embed_dim=config.embed_dim)
    x = _fixed_signal()
    emb = get_param_embeds(jnp.asarray(x)[None], model, 48000)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.removeprefix("encoder."): v for k, v in sd.items()
          if k.startswith("encoder.")} or sd
    from st_ito_tpu.ops.stft import mel_filterbank

    mel = np.asarray(mel_filterbank(config.sample_rate, config.window_size,
                                    config.mel_bins, config.fmin, config.fmax))
    twin = TorchCnn14Twin(config.embed_dim, config.sample_rate,
                          config.window_size, config.hop_size,
                          config.mel_bins, config.fmin, config.fmax,
                          use_batchnorm=config.use_batchnorm,
                          input_norm=config.input_norm, mel_matrix=mel)
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    twin.eval()
    from st_ito_tpu.ops.resample import resample

    xr = np.asarray(resample(jnp.asarray(x), 48000, config.sample_rate))
    with torch.no_grad():
        t_mid, t_side = twin(torch.from_numpy(xr[None]))
    t_mid = t_mid.numpy()
    t_side = t_side.numpy()
    t_mid /= np.linalg.norm(t_mid, axis=-1, keepdims=True)
    t_side /= np.linalg.norm(t_side, axis=-1, keepdims=True)
    return _entry(
        "ok",
        cosine_mid=_cos(emb["mid"][0], t_mid[0]),
        cosine_side=_cos(emb["side"][0], t_side[0]),
        twin_missing=len(missing), twin_unexpected=len(unexpected),
    )


# ------------------------------------------------------------------ CLAP


def convert_clap(path: str, hf_dir: str | None) -> dict:
    import torch

    from st_ito_tpu.models.clap_laion import (
        convert_clap_laion_state_dict, get_clap_laion_embeds,
        load_clap_laion_model,
    )

    model = load_clap_laion_model(ckpt_path=path)
    x = _fixed_signal()
    emb = np.asarray(get_clap_laion_embeds(jnp.asarray(x)[None], model, 48000))

    try:
        from transformers import ClapConfig, ClapModel

        if hf_dir and os.path.isdir(hf_dir):
            t_model = ClapModel.from_pretrained(hf_dir)
        else:
            t_model = ClapModel(ClapConfig())  # htsat-unfused defaults
            sd = torch.load(path, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd)
            t_model.load_state_dict(sd, strict=False)
        t_model.eval()
    except Exception as e:  # pragma: no cover - oracle availability
        return _entry("converted_no_oracle", oracle_error=str(e))

    from st_ito_tpu.ops.resample import resample

    mono = np.asarray(resample(jnp.asarray(x).mean(0, keepdims=True),
                               48000, 48000))[0]
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()
    feats = fe(mono, sampling_rate=48000, return_tensors="pt")
    with torch.no_grad():
        t_emb = t_model.get_audio_features(**feats).numpy()
    return _entry("ok", cosine=_cos(emb[0], t_emb[0]))


# ------------------------------------------------------------------ BEATs


def convert_beats(path: str) -> dict:
    import torch

    from st_ito_tpu.models.beats import (
        BEATsConfig, beats_apply, convert_beats_state_dict,
    )

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    params, cfg = convert_beats_state_dict(sd)
    params = jax.tree.map(jnp.asarray, params)
    x = _fixed_signal(16000, 64000)
    mono = jnp.asarray((x[0] + x[1]) / 2.0)
    emb = np.asarray(beats_apply(params, mono[None], cfg))

    if not os.path.isdir(os.path.join(REF, "st_ito")):
        return _entry("converted_no_oracle",
                      oracle_error="reference tree unavailable")
    sys.path.insert(0, REF)
    try:
        from st_ito.models.beats.BEATs import BEATs, BEATsConfig as TorchCfg

        t_model = BEATs(TorchCfg(ckpt.get("cfg", {})))
        t_model.load_state_dict(sd)
        t_model.eval()
        with torch.no_grad():
            t_emb = t_model.extract_features(
                torch.from_numpy(np.asarray(mono))[None])[0].numpy()
    except Exception as e:  # pragma: no cover
        return _entry("converted_no_oracle", oracle_error=str(e))
    finally:
        sys.path.remove(REF)
    return _entry("ok", cosine=_cos(emb.mean(axis=-2), t_emb.mean(axis=-2)))


# ------------------------------------------------------------------ others


def convert_fxencoder(path: str) -> dict:
    from st_ito_tpu.models.encoders import (
        get_fx_encoder_embeds, load_fx_encoder_model,
    )

    model = load_fx_encoder_model(ckpt_path=path)
    x = _fixed_signal(44100, 88200)
    emb = np.asarray(get_fx_encoder_embeds(jnp.asarray(x)[None], model, 44100)
                     ["embeds"])
    return _entry("converted_no_oracle",
                  note="torch FXencoder twin is test-only "
                       "(tests/test_convert_parity.py:121); embeds finite="
                       f"{bool(np.isfinite(emb).all())}")


def convert_wav2clip(path: str) -> dict:
    from st_ito_tpu.models.wav2clip import (
        get_wav2clip_embeds, load_wav2clip_model,
    )

    model = load_wav2clip_model(ckpt_path=path)
    x = _fixed_signal()
    emb = np.asarray(get_wav2clip_embeds(jnp.asarray(x)[None], model, 48000))
    return _entry("converted_no_oracle",
                  note="upstream wav2clip package unimportable offline; "
                       "frontend constants are documented assumptions "
                       f"(models/wav2clip.py:18-23); embeds finite="
                       f"{bool(np.isfinite(emb).all())}")


def convert_vggish(path: str, pca_path: str | None) -> dict:
    import torch

    from st_ito_tpu.models.vggish import (
        get_vggish_embeds, load_vggish_model,
    )

    model = load_vggish_model(ckpt_path=path, pca_path=pca_path)
    x = _fixed_signal()
    emb = np.asarray(get_vggish_embeds(jnp.asarray(x)[None], model, 48000))

    try:
        from torch_cnn14_twin import nn  # noqa: F401 - probe torch avail
    except Exception:
        pass
    try:
        import test_convert_parity as tp

        twin = tp._torch_vggish_twin()
        sd = torch.load(path, map_location="cpu", weights_only=False)
        twin.load_state_dict(sd, strict=False)
        twin.eval()
        from st_ito_tpu.models.vggish import VGGishConfig, vggish_log_mel_examples

        ex = np.asarray(vggish_log_mel_examples(
            jnp.asarray((x[0] + x[1]) / 2.0), VGGishConfig(), 48000))
        with torch.no_grad():
            t_emb = twin(torch.from_numpy(ex[:, None])).numpy().mean(0)
        return _entry("ok", cosine=_cos(emb[0], t_emb))
    except Exception as e:  # pragma: no cover
        return _entry("converted_no_oracle", oracle_error=str(e))


# ------------------------------------------------------------------ driver


MODELS = {
    "afx_rep": ("afx-rep.ckpt", convert_afx_rep),
    "clap_laion": ("clap-htsat-unfused.pt", None),  # handled specially
    "beats": ("BEATs_iter3.pt", convert_beats),
    "fxencoder": ("fxencoder.pt", convert_fxencoder),
    "wav2clip": ("Wav2CLIP.pt", convert_wav2clip),
    "vggish": ("vggish.pth", None),  # handled specially
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--out", default="examples/convert_report.json")
    ap.add_argument("--clap-hf-dir", default=None,
                    help="local HF laion/clap-htsat-unfused model dir")
    ap.add_argument("--strict", action="store_true",
                    help="exit nonzero if any present checkpoint fails "
                         "parity (cosine < 0.999)")
    args = ap.parse_args()

    report: dict = {"ckpt_dir": os.path.abspath(args.ckpt_dir), "models": {}}
    d = args.ckpt_dir

    def run(name, fname, fn):
        path = os.path.join(d, fname)
        if not os.path.exists(path):
            report["models"][name] = _entry("missing", expected=path)
            return
        try:
            report["models"][name] = fn(path)
        except Exception as e:  # keep going; report per-model
            report["models"][name] = _entry("error", error=repr(e))

    run("afx_rep", "afx-rep.ckpt", convert_afx_rep)
    run("clap_laion", "clap-htsat-unfused.pt",
        lambda p: convert_clap(p, args.clap_hf_dir))
    run("beats", "BEATs_iter3.pt", convert_beats)
    run("fxencoder", "fxencoder.pt", convert_fxencoder)
    run("wav2clip", "Wav2CLIP.pt", convert_wav2clip)
    run("vggish", "vggish.pth",
        lambda p: convert_vggish(
            p, pca := os.path.join(d, "vggish_pca_params.pth")
            if os.path.exists(os.path.join(d, "vggish_pca_params.pth"))
            else None))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    if args.strict:
        bad = [n for n, e in report["models"].items()
               if e["status"] == "error"
               or any(k.startswith("cosine") and v < 0.999
                      for k, v in e.items() if isinstance(v, float))]
        if bad:
            print(f"STRICT: parity failures: {bad}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
