"""Torch-CPU oracle for the L0 geometry ops (yanx27-style semantics).

Re-typed from the canonical pure-PyTorch PointNet++ op definitions
(SURVEY.md §2.1); deterministic variant: FPS takes an explicit start
index instead of randint, so the JAX ops can be compared bit-exactly.
"""

from __future__ import annotations

import torch


def square_distance(src: torch.Tensor, dst: torch.Tensor) -> torch.Tensor:
    """src [B,N,C], dst [B,M,C] -> [B,N,M] squared L2."""
    dist = -2 * torch.matmul(src, dst.permute(0, 2, 1))
    dist += torch.sum(src ** 2, -1).view(src.shape[0], src.shape[1], 1)
    dist += torch.sum(dst ** 2, -1).view(dst.shape[0], 1, dst.shape[1])
    return dist


def index_points(points: torch.Tensor, idx: torch.Tensor) -> torch.Tensor:
    """points [B,N,C], idx [B,...] -> [B,...,C]."""
    B = points.shape[0]
    view_shape = list(idx.shape)
    view_shape[1:] = [1] * (len(view_shape) - 1)
    repeat_shape = list(idx.shape)
    repeat_shape[0] = 1
    batch_indices = (
        torch.arange(B, dtype=torch.long)
        .view(view_shape)
        .repeat(repeat_shape)
    )
    return points[batch_indices, idx, :]


def farthest_point_sample(
    xyz: torch.Tensor, npoint: int, start_idx=0
) -> torch.Tensor:
    """xyz [B,N,3] -> [B,npoint] long.  Deterministic seed point."""
    B, N, _ = xyz.shape
    centroids = torch.zeros(B, npoint, dtype=torch.long)
    distance = torch.ones(B, N) * 1e10
    if isinstance(start_idx, int):
        farthest = torch.full((B,), start_idx, dtype=torch.long)
    else:
        farthest = torch.as_tensor(start_idx, dtype=torch.long).view(B)
    batch_indices = torch.arange(B, dtype=torch.long)
    for i in range(npoint):
        centroids[:, i] = farthest
        centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
        dist = torch.sum((xyz - centroid) ** 2, -1)
        mask = dist < distance
        distance[mask] = dist[mask]
        farthest = torch.max(distance, -1)[1]
    return centroids


def query_ball_point(
    radius: float, nsample: int, xyz: torch.Tensor, new_xyz: torch.Tensor
) -> torch.Tensor:
    """-> [B,S,nsample] long; first-nsample-within-radius, first-hit padding."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    group_idx = (
        torch.arange(N, dtype=torch.long).view(1, 1, N).repeat([B, S, 1])
    )
    sqrdists = square_distance(new_xyz, xyz)
    group_idx[sqrdists > radius ** 2] = N
    group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
    group_first = group_idx[:, :, 0].view(B, S, 1).repeat([1, 1, nsample])
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    return group_idx


def knn_point(nsample: int, xyz: torch.Tensor, new_xyz: torch.Tensor):
    sqrdists = square_distance(new_xyz, xyz)
    _, group_idx = torch.topk(sqrdists, nsample, dim=-1, largest=False, sorted=True)
    return group_idx


def three_nn(xyz1: torch.Tensor, xyz2: torch.Tensor):
    """dense [B,N,3], sparse [B,M,3] -> (dists [B,N,3], idx [B,N,3])."""
    dists = square_distance(xyz1, xyz2)
    dists, idx = dists.sort(dim=-1)
    return dists[:, :, :3], idx[:, :, :3]


def interpolation_weights(dists: torch.Tensor) -> torch.Tensor:
    dist_recip = 1.0 / (dists + 1e-8)
    norm = torch.sum(dist_recip, dim=2, keepdim=True)
    return dist_recip / norm


def three_interpolate(
    points: torch.Tensor, idx: torch.Tensor, weight: torch.Tensor
) -> torch.Tensor:
    """points [B,M,C], idx/weight [B,N,3] -> [B,N,C]."""
    return torch.sum(index_points(points, idx) * weight.unsqueeze(-1), dim=2)


def sample_and_group(npoint, radius, nsample, xyz, points, start_idx=0):
    fps_idx = farthest_point_sample(xyz, npoint, start_idx)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)
    grouped_xyz_norm = grouped_xyz - new_xyz.view(
        xyz.shape[0], npoint, 1, 3
    )
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = torch.cat([grouped_xyz_norm, grouped_points], dim=-1)
    else:
        new_points = grouped_xyz_norm
    return new_xyz, new_points


def sample_and_group_all(xyz, points):
    B, N, _ = xyz.shape
    new_xyz = torch.zeros(B, 1, 3)
    grouped_xyz = xyz.view(B, 1, N, 3)
    if points is not None:
        new_points = torch.cat([grouped_xyz, points.view(B, 1, N, -1)], dim=-1)
    else:
        new_points = grouped_xyz
    return new_xyz, new_points
