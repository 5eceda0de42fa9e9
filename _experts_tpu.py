import time, numpy as np
from lbdrn_msic_tpu.codec import encode_rate_points, encode_pipelined, decode_stream
from lbdrn_msic_tpu.core.config import CodecConfig, TrainSpec
from lbdrn_msic_tpu.eval.metrics import psnr
from lbdrn_msic_tpu.utils.synth import synth_scene

H = W = 2048
img = synth_scene(H, W, channels=4, effective_bits=12, seed=42)
cfgs = [CodecConfig(K=K, train=TrainSpec(sample_granule=8)) for K in (3, 4, 5, 6)]

t0 = time.time(); res = encode_rate_points(img, cfgs); warm = time.time()-t0
for trial in range(2):
    t0 = time.time(); res = encode_rate_points(img, cfgs); t = time.time()-t0
    print(f"expert-batched 4 rate points: {t:.2f}s -> {t/4:.3f}s/job ({H*W*4/t/1e6:.2f} Mpix/s) warm-up {warm:.1f}s")
for cfg, (stream, stats) in zip(cfgs, res):
    rec, _ = decode_stream(stream)
    assert np.array_equal(rec >> cfg.K, img >> cfg.K)
    print(f"  K={cfg.K}: PSNR {psnr(img, rec):.2f} dB bpsp {stats.bpsp:.3f} best_mse {stats.tiles[0].best_mse:.5f}")
