"""Real-coded-speech validation of the native metrics stack.

The upstream repo ships the released encodec_24khz model's actual
reconstructions of one real LibriTTS clip at every bandwidth (reference
demo/README.md) — the only released-weights artifacts reachable in this
sandbox. A correct STOI/SI-SNR/mel-distance implementation must order
those bandwidths; a broken one (constant offset, wrong band matrix,
wrong resample) plausibly would not. Skipped when the reference demo
directory is absent (the suite stays self-contained).
"""

from pathlib import Path

import pytest

DEMO_ROOT = Path('/root/reference/demo')


@pytest.mark.skipif(not DEMO_ROOT.is_dir(),
                    reason='reference demo artifacts not present')
@pytest.mark.parametrize('name', [
    '116_288045_000003_000000_encodec_24khz',
    '116_288045_000003_000000_my_encodec',
])
def test_released_demo_metrics_order_bandwidths(name):
    from scripts.demo_metrics import score_dir

    rows, sr, n = score_dir(DEMO_ROOT / name)
    assert sr == 24_000 and n > 10_000
    assert len(rows) == 5, [r[0] for r in rows]

    stoi = [r[1] for r in rows]
    si = [r[2] for r in rows]
    mel = [r[3] for r in rows]

    # monotone quality in bandwidth (tiny slack for metric noise)
    assert all(b >= a - 1e-3 for a, b in zip(stoi, stoi[1:])), stoi
    assert all(b >= a - 0.25 for a, b in zip(si, si[1:])), si
    assert all(b <= a + 1e-3 for a, b in zip(mel, mel[1:])), mel

    # absolute calibration: high-bw coded speech is near-transparent to
    # STOI, low-bw clearly degraded but intelligible
    assert stoi[-1] > 0.95, stoi
    assert 0.6 < stoi[0] < stoi[-1], stoi
    # 24 kbps reconstruction carries real SNR; 1.5 kbps does not
    assert si[-1] > 5.0 and si[0] < 2.0, si
