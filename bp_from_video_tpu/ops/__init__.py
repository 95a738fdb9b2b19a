"""TPU-native compute ops: signal ring-buffer core, DSP chain, spectra,
correlation, image transforms, ROI kernels, and Pallas TPU kernels."""
