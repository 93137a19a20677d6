"""fastga_tpu — a TPU-native whole-genome aligner with the capabilities of FastGA.

A from-scratch JAX/XLA/Pallas re-design of the FastGA pipeline
(reference: thegenemyers/FASTGA, C99):

  FASTA -> GDB (2-bit genome database)            fastga_tpu.io.gdb
        -> GIX (syncmer-sampled k-mer index)      fastga_tpu.ops.syncmer / io.gix
        -> adaptamer seed merge                   fastga_tpu.ops.merge
        -> seed sort + chain detection            fastga_tpu.ops.chain
        -> batched O(nd) wavefront local aligner  fastga_tpu.ops.wave
        -> dedup + trace-point .1aln output       fastga_tpu.models.aligner / io.alncode

Host-side IO (ONEcode container, GDB, GIX, .1aln) lives in ``fastga_tpu.io``;
device compute lives in ``fastga_tpu.ops`` (all jittable, static shapes);
multi-chip sharding in ``fastga_tpu.parallel``; CLI tools in ``fastga_tpu.cli``.
"""

__version__ = "0.1.0"
