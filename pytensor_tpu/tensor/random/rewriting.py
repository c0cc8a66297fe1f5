"""Random-graph rewrites namespace (reference tensor/random/rewriting/).

The RNG-threading rewrites live with the scan/compile pipelines in this
framework; this module exposes the reference path.
"""
