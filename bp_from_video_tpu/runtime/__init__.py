"""Host runtime + the fused on-device engine: frame capture, device feed,
and the single jitted per-frame step."""
