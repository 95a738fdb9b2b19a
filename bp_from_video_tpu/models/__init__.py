"""Vision model families re-implemented for TPU: a TFLite->JAX graph
compiler (real-weight fidelity), detection pre/post-processing (anchors,
decode, NMS, rotated-rect crops), landmark tracking, and architecture
fallbacks for absent weight files."""
