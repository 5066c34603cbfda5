"""Batched dense kernels: triangulation, features, flow, matching, RANSAC.

Design rule: per-point work is expressed structure-of-arrays / elementwise so
XLA vectorizes it across the VPU's 8x128 lanes; matmul-shaped work (feature
response maps, descriptor distances, normal equations) goes to the MXU. No
data-dependent shapes anywhere — fixed capacities + masks.
"""
