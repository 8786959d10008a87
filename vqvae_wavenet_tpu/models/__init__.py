# Submodules are imported directly (e.g. vqvae_wavenet_tpu.models.wavenet)
# to keep import costs low and avoid circular imports.
