"""CLI tools mirroring the reference binaries (Cargo.toml:18-35):
``construct`` (scene authoring), ``precompute`` (ahead-of-time BVH),
``load`` (full-featured runner), ``demo`` (minimal run)."""
