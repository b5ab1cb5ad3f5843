"""vapor_tpu — TPU-native structural-variant validation framework.

A from-scratch, TPU-first re-design of the capabilities of mills-lab/vapor
(VaPoR: long-read validation of structural variants via k-mer recurrence
plots).  The host side (I/O, SV grammar, planning, output) is pure Python;
the per-(read x haplotype) scoring engine runs as batched JAX/XLA (and
Pallas) kernels on TPU, operating in sheared (diagonal-space) coordinates
so every reduction is a dense row/column operation.

Layer map (mirrors reference layers L0-L9, see SURVEY.md):
  io/       — indexed FASTA + BAM/BGZF readers, CIGAR clipping   (ref L0-L1)
  grammar/  — SV letter grammar, haplotype planning               (ref L3)
  engine/   — dotplot scoring engine: numpy oracle + TPU kernels  (ref L4)
  stats/    — QS/GS/GT/GQ genotyping                              (ref L6)
  writers/  — .vapor TSV + annotated VCF output                   (ref L7)
  cli.py    — bed/vcf/ins/svelter subcommands                     (ref L8)
  parallel/ — device-mesh event sharding, multi-host worklists    (ref L9)
  sim/      — SV simulator + synthetic FASTA/BAM for tests        (ref L11)
"""

__version__ = "0.1.0"
