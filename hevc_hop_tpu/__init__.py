"""hevc_hop_tpu — a TPU-native HEVC Main/Main10 encode/decode engine with
HOP (high-order intrablock prediction) lenslet light-field tools.

Built from scratch for TPU (JAX/XLA/Pallas/pjit). Capability reference:
zinsayon/HEVC-HOP (HM 16.x + IT/Lisbon self-similarity + geometric-transform
extensions). This is NOT a port: the compute path is expressed as batched,
jittable tensor programs (dense per-depth mode evaluation, wavefront diagonal
scheduling, matmul transforms on the MXU), with a native C++ CABAC runtime for
the serial entropy tail.

Layout:
  common/    ROM tables, constants, enums         (ref: TLibCommon/TComRom, TypeDef)
  ops/       jittable compute kernels             (ref: TComTrQuant, TComPrediction, ...)
  entropy/   CABAC engine + syntax coding         (ref: TEncSbac/TDecSbac, ContextTables)
  bitstream/ NAL / RBSP / parameter sets          (ref: TComBitStream, NAL, TEncCavlc)
  models/    encoder/decoder pipelines            (ref: TEncTop/TEncGOP/TEncCu, TDecTop)
  parallel/  mesh sharding, wavefront scheduling  (ref: WPP/tiles constructs)
  io/        YUV file I/O, picture hashes         (ref: TLibVideoIO, TComPicYuvMD5)
  utils/     config system, CLI                   (ref: TAppCommon/program_options_lite)
  native/    C++ runtime sources (CABAC engine)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the wavefront scan programs take
# minutes to compile; cache them across processes (tests, CLI, bench).
import os as _os

if not _os.environ.get("HEVC_HOP_NO_COMPILE_CACHE"):
    import jax as _jax

    # Respect a cache dir the embedding process already configured.
    if not _jax.config.jax_compilation_cache_dir:
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ.get("HEVC_HOP_COMPILE_CACHE",
                                           "/tmp/hevc_hop_xla_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
