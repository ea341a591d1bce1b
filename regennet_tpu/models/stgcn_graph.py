"""Skeleton graph construction for the ST-GCN action classifier.

Port of the reference graph builder (reference:
eval/a2m/recognition/models/stgcnutils/graph.py) with the kinematic trees
taken from the in-repo body-model topology instead of the licensed asset
files. Layouts: 'smpl' (24 joints + translation node), 'smplx' (55 + 1),
'smpl_noglobal' (23), 'openpose' (15, the unconstrained-eval skeleton from
reference: eval/unconstrained/models/stgcnutils/graph.py).
"""

from __future__ import annotations

import numpy as np

from regennet_tpu.ops.body_model import SMPL_PARENTS, SMPLX_PARENTS


class Graph:
    def __init__(self, layout="smpl", strategy="spatial", max_hop=1, dilation=1):
        self.max_hop = max_hop
        self.dilation = dilation
        self.get_edge(layout)
        self.hop_dis = get_hop_distance(self.num_node, self.edge, max_hop=max_hop)
        self.get_adjacency(strategy)

    def get_edge(self, layout):
        if layout == "smpl":
            self.num_node = 24 + 1
            parents = SMPL_PARENTS
            neighbor_link = [(j, int(parents[j])) for j in range(1, 24)]
            neighbor_link.append((0, 24))  # root rotation <-> translation node
            self.center = 0
        elif layout == "smplx":
            self.num_node = 55 + 1
            parents = SMPLX_PARENTS
            neighbor_link = [(j, int(parents[j])) for j in range(1, 55)]
            neighbor_link.append((0, 55))
            self.center = 0
        elif layout == "smpl_noglobal":
            self.num_node = 23
            parents = SMPL_PARENTS
            links = [(j, int(parents[j])) for j in range(1, 24)]
            links = [(i - 1, j - 1) for (i, j) in links if i != 0 and j != 0]
            neighbor_link = links
            self.center = 0
        elif layout == "ntu-rgb+d":
            # the xyz-pose-rep recognition route (reference:
            # actor-x/src/recognition/get_model.py:4-5 picks this when
            # pose_rep == 'xyz' and glob): the published 25-joint NTU-RGB+D
            # (Kinect v2) bone list, 1-based, remapped by (i-2) mod 25 as in
            # actor-x/src/recognition/models/stgcnutils/graph.py:82-93 so
            # the root-translation row lands in the last node slot.
            self.num_node = 25
            neighbor_1base = [
                (1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5), (7, 6),
                (8, 7), (9, 21), (10, 9), (11, 10), (12, 11), (13, 1),
                (14, 13), (15, 14), (16, 15), (17, 1), (18, 17), (19, 18),
                (20, 19), (22, 23), (23, 8), (24, 25), (25, 12),
            ]
            neighbor_link = [
                ((i - 2) % self.num_node, (j - 2) % self.num_node)
                for (i, j) in neighbor_1base
            ]
            self.center = 21 - 2
        elif layout == "ntu_edge":
            # no-glob variant (reference graph.py:94-102): 24 nodes, the
            # ST-GCN paper's NTU edge layout, 1-based bones shifted by -1
            self.num_node = 24
            neighbor_1base = [
                (1, 2), (3, 2), (4, 3), (5, 2), (6, 5), (7, 6), (8, 7),
                (9, 2), (10, 9), (11, 10), (12, 11), (13, 1), (14, 13),
                (15, 14), (16, 15), (17, 1), (18, 17), (19, 18), (20, 19),
                (21, 22), (22, 8), (23, 24), (24, 12),
            ]
            neighbor_link = [(i - 1, j - 1) for (i, j) in neighbor_1base]
            self.center = 2
        elif layout == "openpose":
            # 15-joint openpose-style skeleton used by the unconstrained
            # HumanAct12 evaluator (reference:
            # eval/unconstrained/models/stgcnutils/graph.py:46-62); joint
            # order comes from the SMPL->openpose index list in
            # eval/a2m/gru_eval.py:116.
            self.num_node = 15
            neighbor_link = [
                (4, 3), (3, 2), (2, 1),
                (7, 6), (6, 5), (5, 1),
                (1, 0),
                (14, 13), (13, 12), (12, 8),
                (11, 10), (10, 9), (9, 8),
                (8, 1),
            ]
            self.center = 1
        else:
            raise NotImplementedError("This Layout is not supported")
        self_link = [(i, i) for i in range(self.num_node)]
        self.edge = self_link + neighbor_link

    def get_adjacency(self, strategy):
        valid_hop = range(0, self.max_hop + 1, self.dilation)
        adjacency = np.zeros((self.num_node, self.num_node))
        for hop in valid_hop:
            adjacency[self.hop_dis == hop] = 1
        normalize_adjacency = normalize_digraph(adjacency)

        if strategy == "uniform":
            self.A = normalize_adjacency[None]
        elif strategy == "distance":
            A = np.zeros((len(list(valid_hop)), self.num_node, self.num_node))
            for i, hop in enumerate(valid_hop):
                A[i][self.hop_dis == hop] = normalize_adjacency[self.hop_dis == hop]
            self.A = A
        elif strategy == "spatial":
            A = []
            for hop in valid_hop:
                a_root = np.zeros((self.num_node, self.num_node))
                a_close = np.zeros((self.num_node, self.num_node))
                a_further = np.zeros((self.num_node, self.num_node))
                for i in range(self.num_node):
                    for j in range(self.num_node):
                        if self.hop_dis[j, i] == hop:
                            if (
                                self.hop_dis[j, self.center]
                                == self.hop_dis[i, self.center]
                            ):
                                a_root[j, i] = normalize_adjacency[j, i]
                            elif (
                                self.hop_dis[j, self.center]
                                > self.hop_dis[i, self.center]
                            ):
                                a_close[j, i] = normalize_adjacency[j, i]
                            else:
                                a_further[j, i] = normalize_adjacency[j, i]
                if hop == 0:
                    A.append(a_root)
                else:
                    A.append(a_root + a_close)
                    A.append(a_further)
            self.A = np.stack(A)
        else:
            raise NotImplementedError("This Strategy is not supported")


def get_hop_distance(num_node, edge, max_hop=1):
    A = np.zeros((num_node, num_node))
    for i, j in edge:
        A[j, i] = 1
        A[i, j] = 1
    hop_dis = np.zeros((num_node, num_node)) + np.inf
    transfer_mat = [np.linalg.matrix_power(A, d) for d in range(max_hop + 1)]
    arrive_mat = np.stack(transfer_mat) > 0
    for d in range(max_hop, -1, -1):
        hop_dis[arrive_mat[d]] = d
    return hop_dis


def normalize_digraph(A):
    Dl = np.sum(A, 0)
    Dn = np.zeros_like(A)
    for i in range(A.shape[0]):
        if Dl[i] > 0:
            Dn[i, i] = Dl[i] ** (-1)
    return np.dot(A, Dn)
