"""genomics_general_tpu — a TPU-native population-genomics engine.

A from-scratch reimplementation of the capabilities of the
`simonhmartin/genomics_general` toolkit, designed TPU-first:

* genotype text streams (.geno / VCF) are parsed host-side into dense numeric
  genotype tensors (haplotypes x sites, int8; see `encoding`),
* sliding / predefined windows become a static host-built *window plan*
  (`windows`) that maps each window to a contiguous span of the site axis,
* per-site allele counting and pairwise masked-Hamming distances run on the
  TPU MXU as one-hot matmuls with exact integer accumulation (`kernels`),
* final per-window statistics (pi, dxy, Fst, Tajima panel, ABBA-BABA D/fd/fdM,
  the extended f4 family, allele frequencies, SFS, distance matrices) are
  finalized in float64 to be value-equal with the reference scripts
  (`stats`), and
* multi-chip/multi-host scaling shards window batches data-parallel over a
  `jax.sharding.Mesh` with collective merges for genome-wide accumulators
  (`parallel`).

Reference behavior is documented per-function with `file:line` citations into
the upstream repo (mounted read-only at /root/reference in the dev image).
"""

__version__ = "0.1.0"

from . import encoding  # noqa: F401

__all__ = ["encoding"]
