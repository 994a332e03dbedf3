"""ECAPA-TDNN converter parity: JAX encoder vs the published equations.

The real speaker checkpoints (speechbrain ``spkrec-ecapa-voxceleb``)
cannot be downloaded in this zero-egress environment, so — like the
other converter-parity suites pin tiny HF configs — this test builds a
tiny ECAPA in **torch**, module-for-module after the speechbrain
implementation (reflect-padded dilated Conv1d wrappers, TDNN =
conv→ReLU→BatchNorm, Res2Net hierarchy, SE gate on the time mean, ASP
with global context and 1e-12-clamped std), randomizes its weights AND
its BN running stats, saves a state dict in the release's key layout,
runs ``convert_speaker`` on it, and requires the JAX encoder to match
the torch eval-mode output. This is the contract that a real
downloaded checkpoint converts and runs correctly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from audio_rag_tpu.convert import convert_speaker  # noqa: E402
from audio_rag_tpu.models.ecapa import (  # noqa: E402
    ecapa_embed,
    is_ecapa_params,
)

C, MFA, ATTN, SE, EMB, SCALE, N_MELS = 32, 48, 16, 8, 12, 4, 20


class SBConv1d(nn.Module):
    """speechbrain Conv1d: reflect 'same' padding, inner ``.conv``."""

    def __init__(self, c_in, c_out, k, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(c_in, c_out, k, dilation=dilation)

    def forward(self, x):
        k, d = self.conv.kernel_size[0], self.conv.dilation[0]
        pad = (k - 1) * d // 2
        if pad:
            x = F.pad(x, (pad, pad), mode="reflect")
        return self.conv(x)


class SBBatchNorm1d(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.BatchNorm1d(c)

    def forward(self, x):
        return self.norm(x)


class TDNNBlock(nn.Module):
    def __init__(self, c_in, c_out, k, dilation):
        super().__init__()
        self.conv = SBConv1d(c_in, c_out, k, dilation)
        self.activation = nn.ReLU()
        self.norm = SBBatchNorm1d(c_out)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class Res2NetBlock(nn.Module):
    def __init__(self, channels, scale, k, dilation):
        super().__init__()
        width = channels // scale
        self.blocks = nn.ModuleList(
            [TDNNBlock(width, width, k, dilation) for _ in range(scale - 1)]
        )
        self.scale = scale

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SEBlock(nn.Module):
    def __init__(self, channels, se_channels):
        super().__init__()
        self.conv1 = SBConv1d(channels, se_channels, 1)
        self.conv2 = SBConv1d(se_channels, channels, 1)

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = torch.relu(self.conv1(s))
        s = torch.sigmoid(self.conv2(s))
        return s * x


class SERes2NetBlock(nn.Module):
    def __init__(self, channels, scale, se_channels, k, dilation):
        super().__init__()
        self.tdnn1 = TDNNBlock(channels, channels, 1, 1)
        self.res2net_block = Res2NetBlock(channels, scale, k, dilation)
        self.tdnn2 = TDNNBlock(channels, channels, 1, 1)
        self.se_block = SEBlock(channels, se_channels)

    def forward(self, x):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x)
        return x + residual


def _stats(x, m):
    mean = (m * x).sum(dim=2)
    std = torch.sqrt(
        ((m * (x - mean.unsqueeze(2)) ** 2).sum(dim=2)).clamp(1e-12))
    return mean, std


class ECAPA(nn.Module):
    def __init__(self):
        super().__init__()
        self.blocks = nn.ModuleList([
            TDNNBlock(N_MELS, C, 5, 1),
            SERes2NetBlock(C, SCALE, SE, 3, 2),
            SERes2NetBlock(C, SCALE, SE, 3, 3),
            SERes2NetBlock(C, SCALE, SE, 3, 4),
        ])
        self.mfa = TDNNBlock(3 * C, MFA, 1, 1)
        self.asp = nn.Module()
        self.asp.tdnn = TDNNBlock(3 * MFA, ATTN, 1, 1)
        self.asp.conv = SBConv1d(ATTN, MFA, 1)
        self.asp_bn = SBBatchNorm1d(2 * MFA)
        self.fc = SBConv1d(2 * MFA, EMB, 1)

    def forward(self, x):  # x (B, n_mels, T)
        xl = []
        for layer in self.blocks:
            x = layer(x)
            xl.append(x)
        x = torch.cat(xl[1:], dim=1)
        x = self.mfa(x)
        t = x.shape[-1]
        uniform = torch.full((1, 1, t), 1.0 / t)
        g_mean, g_std = _stats(x, uniform)
        ctx = torch.cat(
            [x,
             g_mean.unsqueeze(2).expand(-1, -1, t),
             g_std.unsqueeze(2).expand(-1, -1, t)], dim=1)
        a = self.asp.conv(torch.tanh(self.asp.tdnn(ctx)))
        w = torch.softmax(a, dim=2)
        mean, std = _stats(x, w)
        pooled = torch.cat([mean, std], dim=1)
        pooled = self.asp_bn(pooled)
        emb = self.fc(pooled.unsqueeze(2)).squeeze(2)
        return F.normalize(emb, dim=1)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = ECAPA()
    # non-trivial eval-mode BN running stats — the part the converter folds
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0.0, 0.2)
    model.eval()
    return model


class TestECAPAParity:
    def test_convert_and_match(self, torch_model, tmp_path):
        torch.save(torch_model.state_dict(),
                   tmp_path / "embedding_model.ckpt")
        params = convert_speaker(tmp_path)
        assert is_ecapa_params(params)
        assert len(params["layers"]) == 3
        assert len(params["layers"][0]["res2net"]) == SCALE - 1

        rng = np.random.default_rng(0)
        fb = rng.standard_normal((3, N_MELS, 97)).astype(np.float32) * 2.0
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(fb)).numpy()
        out = np.asarray(ecapa_embed(
            params, jnp.asarray(fb.transpose(0, 2, 1)),
            dtype=jnp.float32))
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_prefixed_checkpoint(self, torch_model, tmp_path):
        """HF-style combined dicts carry an ``embedding_model.`` prefix."""
        sd = {f"embedding_model.{k}": v
              for k, v in torch_model.state_dict().items()}
        torch.save(sd, tmp_path / "model.ckpt")
        params = convert_speaker(tmp_path)
        assert is_ecapa_params(params)

    def test_dims_inferred(self, torch_model, tmp_path):
        from audio_rag_tpu.models.speaker import speaker_dims_from_params

        torch.save(torch_model.state_dict(),
                   tmp_path / "embedding_model.ckpt")
        dims = speaker_dims_from_params(convert_speaker(tmp_path))
        assert (dims.n_mels, dims.channels, dims.emb_dim) == (N_MELS, C, EMB)

    def test_converted_checkpoint_drives_diarizer(self, torch_model,
                                                  tmp_path):
        """The full real-weights route: convert → save_params →
        ``diarization.checkpoint_path`` → diarize() picks the ECAPA
        frontend+encoder and produces labeled segments."""
        from audio_rag_tpu.audio.synth import speech_like
        from audio_rag_tpu.checkpoint import save_params
        from audio_rag_tpu.config.schema import DiarizationConfig
        from audio_rag_tpu.diarization.clustering import ClusteringDiarizer

        torch.save(torch_model.state_dict(),
                   tmp_path / "embedding_model.ckpt")
        save_params(tmp_path / "ckpt", "speaker",
                    convert_speaker(tmp_path))
        d = ClusteringDiarizer(DiarizationConfig(
            checkpoint_path=str(tmp_path / "ckpt"),
            vad_backend="energy"))
        d.load()
        try:
            assert d.dims.n_mels == N_MELS  # dims follow the checkpoint
            sr = 16000
            audio = np.concatenate([
                speech_like(sr * 3, sr, f0=110.0, seed=0),
                speech_like(sr * 3, sr, f0=250.0, seed=1),
            ])
            segs = d.diarize(audio, sr)
            assert segs
            assert all(s.speaker.startswith("SPEAKER_") for s in segs)
        finally:
            d.unload()
