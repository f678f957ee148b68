"""Intra edge-availability tree (reference src/intra_edge.c:56-150).

A static automaton over the superblock partition tree that tracks, for
every block position, whether its top-right / bottom-left neighbors are
available for intra edge construction, per chroma layout.
"""
from __future__ import annotations

from . import levels as lv

# flags (reference src/intra_edge.h:32-47)
EDGE_I444_TOP_HAS_RIGHT = 1 << 0
EDGE_I422_TOP_HAS_RIGHT = 1 << 1
EDGE_I420_TOP_HAS_RIGHT = 1 << 2
EDGE_I444_LEFT_HAS_BOTTOM = 1 << 3
EDGE_I422_LEFT_HAS_BOTTOM = 1 << 4
EDGE_I420_LEFT_HAS_BOTTOM = 1 << 5
EDGE_ALL_TOP_HAS_RIGHT = 0b000111
EDGE_ALL_LEFT_HAS_BOTTOM = 0b111000
EDGE_ALL_TR_AND_BL = 0b111111


class EdgeNode:
    __slots__ = ("o", "h", "v", "split", "h4", "v4", "children", "is_tip")

    def __init__(self):
        self.o = 0
        self.h = [0, 0]
        self.v = [0, 0]
        self.split = [0, 0, 0]   # tips only
        self.h4 = 0              # branches only
        self.v4 = 0
        self.children = None     # branches only: 4 EdgeNodes
        self.is_tip = False


def _init_edges(node: EdgeNode, bl: int, edge_flags: int) -> None:
    node.o = edge_flags
    node.h[0] = edge_flags | EDGE_ALL_LEFT_HAS_BOTTOM
    node.v[0] = edge_flags | EDGE_ALL_TOP_HAS_RIGHT
    if bl == lv.BL_8X8:
        node.is_tip = True
        node.h[1] = edge_flags & (EDGE_ALL_LEFT_HAS_BOTTOM |
                                  EDGE_I420_TOP_HAS_RIGHT)
        node.v[1] = edge_flags & (EDGE_ALL_TOP_HAS_RIGHT |
                                  EDGE_I420_LEFT_HAS_BOTTOM |
                                  EDGE_I422_LEFT_HAS_BOTTOM)
        node.split[0] = (edge_flags & EDGE_ALL_TOP_HAS_RIGHT) | \
            EDGE_I422_LEFT_HAS_BOTTOM
        node.split[1] = edge_flags | EDGE_I444_TOP_HAS_RIGHT
        node.split[2] = edge_flags & (EDGE_I420_TOP_HAS_RIGHT |
                                      EDGE_I420_LEFT_HAS_BOTTOM |
                                      EDGE_I422_LEFT_HAS_BOTTOM)
    else:
        node.h[1] = edge_flags & EDGE_ALL_LEFT_HAS_BOTTOM
        node.v[1] = edge_flags & EDGE_ALL_TOP_HAS_RIGHT
        node.h4 = EDGE_ALL_LEFT_HAS_BOTTOM
        node.v4 = EDGE_ALL_TOP_HAS_RIGHT
        if bl == lv.BL_16X16:
            node.h4 |= edge_flags & EDGE_I420_TOP_HAS_RIGHT
            node.v4 |= edge_flags & (EDGE_I420_LEFT_HAS_BOTTOM |
                                     EDGE_I422_LEFT_HAS_BOTTOM)


def _init_mode_node(bl: int, top_has_right: int, left_has_bottom: int) -> EdgeNode:
    node = EdgeNode()
    _init_edges(node, bl,
                (EDGE_ALL_TOP_HAS_RIGHT if top_has_right else 0) |
                (EDGE_ALL_LEFT_HAS_BOTTOM if left_has_bottom else 0))
    node.children = []
    if bl == lv.BL_16X16:
        for n in range(4):
            tip = EdgeNode()
            _init_edges(tip, bl + 1,
                        (0 if (n == 3 or (n == 1 and not top_has_right))
                         else EDGE_ALL_TOP_HAS_RIGHT) |
                        (EDGE_ALL_LEFT_HAS_BOTTOM
                         if (n == 0 or (n == 2 and left_has_bottom)) else 0))
            node.children.append(tip)
    else:
        for n in range(4):
            node.children.append(_init_mode_node(
                bl + 1,
                int(not (n == 3 or (n == 1 and not top_has_right))),
                int(n == 0 or (n == 2 and left_has_bottom))))
    return node


# dav1d_intra_edge_tree equivalents: [BL_128X128 root, BL_64X64 root]
INTRA_EDGE_TREE = (_init_mode_node(lv.BL_128X128, 1, 0),
                   _init_mode_node(lv.BL_64X64, 1, 0))
