"""iqtree_tpu — a TPU-native maximum-likelihood phylogenetics framework.

A from-scratch re-design of the capabilities of IQ-TREE (reference:
/root/reference, v1.4.3-beta) for TPU hardware: the likelihood engine is
JAX/XLA/Pallas (array-encoded trees, batched Felsenstein pruning, autodiff
branch gradients, pjit/shard_map over device meshes); the search driver,
tree bookkeeping and I/O are host-side Python/NumPy.

Layer map (mirrors SURVEY.md):
  io/        alignments (PHYLIP/FASTA/NEXUS/CLUSTAL), Newick, reports
  trees/     host tree structures, splits, consensus, BIONJ, random trees
  models/    substitution models + rate heterogeneity + model factory
  engine/    likelihood/pruning/parsimony/distance kernels (JAX + Pallas)
  search/    stochastic NNI search, candidate set, stop rule, UFBoot
  parallel/  mesh + sharding helpers
  utils/     checkpoint, optimizers, special functions, logging
"""

__version__ = "0.1.0"
