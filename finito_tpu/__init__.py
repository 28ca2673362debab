"""finito_tpu: a TPU-native finimizer engine.

A from-scratch JAX/XLA implementation of the capabilities of
ElenaBiagi/Finito (reference: /root/reference): shortest-unique-finimizer
(t=1 "rarest") k-mer localization indexes over spectrum-preserving string
sets, built on a plain-matrix SBWT + LCS array, answering streaming
(unitig id, offset) queries bit-exactly compatible with the reference's
`search-fmin`, plus the reference's secondary minimizer-index stack
(`kmer-mapper`).

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):
  L0  ops/      packed bitvectors + rank superblocks as dense arrays
  L1  sbwt/     plain-matrix SBWT: construction, interval ops, LCS
  L2  index/    PackedStrings, finimizer selection, FinimizerIndex
  L3  query/    streaming search oracle + batched TPU query engines
  L4  cli       build-fmin / search-fmin / kmer-mapper commands
  px  parallel/ device-mesh sharding for multi-chip scale-out
"""

from finito_tpu.version import __version__

__all__ = ["__version__"]
