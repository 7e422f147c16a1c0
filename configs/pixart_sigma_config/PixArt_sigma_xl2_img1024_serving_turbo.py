# Production SERVING preset (no reference analogue — the reference serves
# plain fp16, scripts/inference.py:161): the quality-validated turbo stack.
#
#   int8 W8A8 matmuls          +12%  (toy rel-FID 0.72 vs bf16 0.76)
#   delta block cache @2       +33%  (toy rel-FID neutral at interval 2)
#   composite (measured r5)    +49%: 0.648 vs 0.436 img/s/chip at the
#                              1024px 20-step DPM-Solver++ CFG4.5 op point
#
# Use with scripts/serve.py --turbo or scripts/inference.py
# --block-cache-interval 2 --int8; bench.py prints the composite as its
# turbo row. Quality numbers: docs/performance.md §turbo.
_base_ = ["./PixArt_sigma_xl2_img1024_internalms_kvcompress.py"]

quant_int8 = True            # dynamic W8A8 projections/MLPs (2x MXU on v5e)
cache_span = (7, 21)         # delta-cache group = blocks 7..20 (validated)
block_cache_interval = 2     # refresh the cached residual every 2 NFE
