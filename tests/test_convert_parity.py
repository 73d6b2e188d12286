"""Checkpoint-conversion parity: BEATs and FXencoder twins.

The BEATs test drives the reference's actual vendored TransformerEncoder
(read from /root/reference at test time — gated) with random weights,
converts its state_dict through the repo's converter, and checks the JAX
encoder reproduces it — including the GRU-gated relative-position bias and
DeepNorm residuals that round 1 omitted. The FXencoder test uses a small
torch twin mirroring the release's Conv1d_layer nesting
(reference: st_ito/models/fx_encoder.py:98-363) to validate the key remap.
"""

import os
import sys
from collections import OrderedDict
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"


def test_beats_encoder_parity_with_reference():
    if not os.path.isdir(os.path.join(REF, "st_ito")):
        pytest.skip("reference tree unavailable")
    sys.path.insert(0, REF)
    try:
        from st_ito.models.beats.backbone import TransformerEncoder
    except Exception as e:  # pragma: no cover - import-env dependent
        pytest.skip(f"reference backbone not importable: {e}")
    finally:
        sys.path.remove(REF)

    from st_ito_tpu.models.beats import (
        BEATsConfig,
        beats_encode_fbank,
        convert_beats_state_dict,
    )

    torch.manual_seed(0)
    D, depth, heads, ffn = 64, 2, 4, 128
    embed, patch = 32, 4
    args = SimpleNamespace(
        dropout=0.0, encoder_embed_dim=D, conv_pos=16, conv_pos_groups=4,
        relative_position_embedding=True, num_buckets=16, max_distance=64,
        encoder_layers=depth, encoder_ffn_embed_dim=ffn,
        encoder_attention_heads=heads, attention_dropout=0.0,
        activation_dropout=0.0, activation_fn="gelu", layer_norm_first=False,
        deep_norm=True, gru_rel_pos=True, encoder_layerdrop=0.0,
    )
    ref_enc = TransformerEncoder(args).eval()
    patch_embedding = torch.nn.Conv2d(1, embed, patch, stride=patch,
                                      bias=False)
    layer_norm = torch.nn.LayerNorm(embed)
    post_extract_proj = torch.nn.Linear(embed, D)

    frames, mels = 16, 16
    fbank = torch.randn(2, frames, mels)

    with torch.no_grad():
        # reference extract_features minus the kaldi preprocess
        # (st_ito/models/beats/beats.py:159-180)
        feats = patch_embedding(fbank.unsqueeze(1))
        feats = feats.reshape(feats.shape[0], feats.shape[1], -1).transpose(1, 2)
        feats = post_extract_proj(layer_norm(feats))
        ref_out, _ = ref_enc(feats)

    sd = {f"encoder.{k}": v for k, v in ref_enc.state_dict().items()}
    sd.update({f"patch_embedding.{k}": v
               for k, v in patch_embedding.state_dict().items()})
    sd.update({f"layer_norm.{k}": v for k, v in layer_norm.state_dict().items()})
    sd.update({f"post_extract_proj.{k}": v
               for k, v in post_extract_proj.state_dict().items()})

    cfg = BEATsConfig(embed_dim=embed, encoder_embed_dim=D, depth=depth,
                      heads=heads, ffn_dim=ffn, patch=patch, conv_pos=16,
                      conv_pos_groups=4, num_buckets=16, max_distance=64,
                      deep_norm=True, gru_rel_pos=True)
    params = convert_beats_state_dict(sd, cfg)
    out = np.asarray(jax.jit(
        lambda p, f: beats_encode_fbank(p, f, cfg))(params,
                                                    jnp.asarray(fbank.numpy())))
    scale = np.abs(ref_out.numpy()).max()
    np.testing.assert_allclose(out, ref_out.numpy(), atol=3e-4 * scale)


class _TorchConvLayer(torch.nn.Module):
    """Mirrors the release's Conv1d_layer 'conv' mode module nesting
    (fx_encoder.py:98-205): conv1d.{conv1d_pad,conv1d,batch_norm,relu}."""

    def __init__(self, in_c, out_c, k, s):
        super().__init__()
        pad = k - 1
        self.conv1d = torch.nn.Sequential(OrderedDict([
            ("conv1d_pad", torch.nn.ReflectionPad1d((pad // 2, pad - pad // 2))),
            ("conv1d", torch.nn.Conv1d(in_c, out_c, k, stride=s)),
            ("batch_norm", torch.nn.BatchNorm1d(out_c)),
            ("relu", torch.nn.ReLU()),
        ]))

    def forward(self, x):
        return self.conv1d(x)


class _TorchResBlock(torch.nn.Module):
    """Res_ConvBlock (fx_encoder.py:216-283)."""

    def __init__(self, in_c, out_c, k, s):
        super().__init__()
        self.conv1 = _TorchConvLayer(in_c, in_c, k, 1)
        self.conv2 = _TorchConvLayer(in_c, out_c, k, s)

    def forward(self, x):
        return self.conv2(self.conv1(x) + x)


def test_fx_encoder_converter_parity(tmp_path):
    from st_ito_tpu.models.encoders import (
        FXEncoderConfig,
        fx_encoder_apply,
    )
    from st_ito_tpu.models.convert import (
        listify_numeric,
        torch_state_dict_to_params,
    )

    torch.manual_seed(1)
    channels = (2, 4, 8)
    kernels = (5, 5)
    strides = (2, 2)
    blocks = [_TorchResBlock(channels[i], channels[i + 1], kernels[i],
                             strides[i]) for i in range(len(kernels))]
    ref = torch.nn.Module()
    ref.encoder = torch.nn.Sequential(*blocks)
    ref.eval()

    x = torch.randn(2, 2, 64)
    with torch.no_grad():
        h = ref.encoder(x)
        ref_out = h.mean(dim=-1)  # AdaptiveAvgPool1d(1) (fx_encoder.py:355)

    # same remap as load_fx_encoder_model
    sd = {
        k.replace(".conv1d.conv1d.", ".").replace(".conv1d.batch_norm.", ".bn."): v
        for k, v in ref.state_dict().items()
    }
    params = listify_numeric(torch_state_dict_to_params(sd))
    cfg = FXEncoderConfig(embed_dim=8, channels=channels, kernels=kernels,
                          strides=strides)
    out = np.asarray(jax.jit(
        lambda p, xx: fx_encoder_apply(p, xx, cfg))(params,
                                                    jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref_out.numpy(), atol=1e-4)


# ----------------------------------------------------------------------
# VGGish (reference: st_ito/utils.py:352-383; upstream torch.hub
# harritaylor/torchvggish). Twin mirrors the upstream VGG Sequential
# layout exactly, including the transpose-before-flatten.
# ----------------------------------------------------------------------


def _torch_vggish_twin():
    import torch.nn as nn

    layers, in_c = [], 1
    for v in [64, "M", 128, "M", 256, 256, "M", 512, 512, "M"]:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU(True)]
            in_c = v

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*layers)
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128), nn.ReLU(True))

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    return VGG()


def test_vggish_converter_parity():
    from st_ito_tpu.models.vggish import (
        convert_vggish_state_dict,
        vggish_forward,
        vggish_postprocess,
    )

    torch.manual_seed(2)
    twin = _torch_vggish_twin().eval()
    x = torch.randn(3, 1, 96, 64)
    with torch.no_grad():
        ref = twin(x).numpy()

    params = convert_vggish_state_dict(twin.state_dict())
    out = np.asarray(jax.jit(vggish_forward)(params,
                                             jnp.asarray(x.numpy()[:, 0])))
    np.testing.assert_allclose(out, ref, atol=2e-4 * max(1.0, np.abs(ref).max()))

    # PCA postprocessor parity vs the upstream formula
    rng = np.random.default_rng(0)
    M = rng.standard_normal((128, 128)).astype(np.float32)
    mu = rng.standard_normal((128, 1)).astype(np.float32)
    params["pca_eigen_vectors"] = jnp.asarray(M)
    params["pca_means"] = jnp.asarray(mu)
    e = rng.standard_normal((5, 128)).astype(np.float32) * 0.1
    got = np.asarray(vggish_postprocess(params, jnp.asarray(e)))
    want = np.round((np.clip((M @ (e.T - mu)).T, -2.0, 2.0) + 2.0)
                    * (255.0 / 4.0))
    np.testing.assert_allclose(got, want, atol=1e-3)


# ----------------------------------------------------------------------
# Wav2CLIP (reference: st_ito/utils.py:316-347; upstream
# descriptinc/lyrebird-wav2clip). Twin mirrors the torchvision ResNet-18
# state_dict layout the release nests under `encoder.`, plus the
# `transform` projection MLP.
# ----------------------------------------------------------------------


class _TorchBasicBlock(torch.nn.Module):
    def __init__(self, in_c, out_c, stride):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(in_c, out_c, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_c)
        self.conv2 = nn.Conv2d(out_c, out_c, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_c)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or in_c != out_c:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_c, out_c, 1, stride, bias=False),
                nn.BatchNorm2d(out_c))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idn)


class _TorchResNet18(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(1, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans, in_c = [64, 128, 256, 512], 64
        for si, c in enumerate(chans, start=1):
            stride = 1 if si == 1 else 2
            setattr(self, f"layer{si}", nn.Sequential(
                _TorchBasicBlock(in_c, c, stride),
                _TorchBasicBlock(c, c, 1)))
            in_c = c
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 512)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for si in range(1, 5):
            x = getattr(self, f"layer{si}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def test_wav2clip_converter_parity():
    from st_ito_tpu.models.wav2clip import (
        convert_wav2clip_state_dict,
        resnet18_forward,
        wav2clip_transform,
    )

    torch.manual_seed(3)
    twin = _TorchResNet18()
    transform = torch.nn.Sequential(
        torch.nn.Linear(512, 512), torch.nn.ReLU(), torch.nn.Linear(512, 512))
    # exercise BN running stats: one training-mode pass moves them off init
    twin.train()
    with torch.no_grad():
        twin(torch.randn(4, 1, 64, 96))
    twin.eval()

    spec = torch.randn(2, 1, 64, 96)
    with torch.no_grad():
        ref = transform(twin(spec)).numpy()

    sd = {f"encoder.{k}": v for k, v in twin.state_dict().items()}
    sd.update({f"transform.sequential.{k}": v
               for k, v in transform.state_dict().items()})
    params = convert_wav2clip_state_dict(sd)
    out = np.asarray(jax.jit(
        lambda p, s: wav2clip_transform(p, resnet18_forward(p, s)))(
            params, jnp.asarray(spec.numpy())))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=5e-4 * scale)


# ----------------------------------------------------------------------
# LAION-CLAP audio tower (HTSAT-unfused) vs transformers' ClapModel
# (reference: st_ito/models/clap.py:6-42, utils.py:389-438). transformers
# is installed, so the twin here is the REAL HF module with random
# weights — the exact graph the released checkpoint loads into.
# ----------------------------------------------------------------------


def test_clap_laion_tower_parity_with_transformers():
    transformers = pytest.importorskip("transformers")
    from transformers import ClapAudioConfig
    from transformers.models.clap.modeling_clap import (
        ClapAudioModelWithProjection,
    )

    from st_ito_tpu.models.clap_laion import (
        ClapLaionConfig,
        clap_audio_tower,
        convert_clap_laion_state_dict,
    )

    torch.manual_seed(5)
    hf_cfg = ClapAudioConfig(
        spec_size=64, num_mel_bins=16, patch_size=4, patch_stride=[4, 4],
        window_size=4, depths=[1, 2, 1], num_attention_heads=[2, 4, 2],
        patch_embeds_hidden_size=16, hidden_size=64, projection_dim=32,
        enable_fusion=False)
    twin = ClapAudioModelWithProjection(hf_cfg).eval()
    # move BN stats off init so the conversion is actually exercised
    with torch.no_grad():
        twin.audio_model.audio_encoder.batch_norm.running_mean.uniform_(-1, 1)
        twin.audio_model.audio_encoder.batch_norm.running_var.uniform_(0.5, 2)

    # time = spec_size * freq_ratio -> no interpolation inside the model
    feats = torch.randn(2, 1, 64 * 4, 16)
    with torch.no_grad():
        out = twin(input_features=feats)
        ref = out.audio_embeds.numpy()

    cfg = ClapLaionConfig(spec_size=64, n_mels=16, patch=4, window=4,
                          depths=(1, 2, 1), heads=(2, 4, 2), patch_dim=16,
                          hidden=64, proj_dim=32)
    params = convert_clap_laion_state_dict(twin.state_dict(), cfg)
    _, proj = jax.jit(
        lambda p, f: clap_audio_tower(p, f, cfg))(params,
                                                  jnp.asarray(feats.numpy()))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(proj), ref, atol=5e-4 * scale)


def test_clap_laion_mel2img_interpolation_matches_torch():
    from st_ito_tpu.models.clap_laion import ClapLaionConfig, reshape_mel2img

    torch.manual_seed(6)
    cfg = ClapLaionConfig(spec_size=64, n_mels=16)
    feats = torch.randn(2, 1, 101, 16)  # 101 < 256 frames -> interpolation
    ref = torch.nn.functional.interpolate(
        feats, (64 * 4, 16), mode="bicubic", align_corners=True)
    b, c, t, f = ref.shape
    r = cfg.freq_ratio
    ref = ref.reshape(b, c * r, t // r, f).permute(0, 1, 3, 2).reshape(
        b, c, f * r, t // r).numpy()
    got = np.asarray(reshape_mel2img(jnp.asarray(feats.numpy()), cfg))
    np.testing.assert_allclose(got, ref, atol=1e-4)  # f32 matmul roundoff


def test_clap_laion_mel_frontend_matches_hf_extractor():
    transformers = pytest.importorskip("transformers")
    from transformers import ClapFeatureExtractor

    from st_ito_tpu.models.clap_laion import ClapLaionConfig, clap_mel

    fe = ClapFeatureExtractor(frequency_min=50, frequency_max=14000)
    rng = np.random.default_rng(9)
    x = (rng.standard_normal(48000 * 2) * 0.2).astype(np.float32)
    ref = fe._np_extract_fbank_features(x, fe.mel_filters_slaney)
    got = np.asarray(clap_mel(jnp.asarray(x)[None], ClapLaionConfig())[0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-2)
