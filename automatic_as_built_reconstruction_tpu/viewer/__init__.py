"""Web viewer: point clouds + GT boxes + live inference in the browser.

The reference ships a flask + three.js KITTI viewer
[ref: second/kittiviewer/ — lineage-expected, UNVERIFIED].  This rebuild is
dependency-free: a stdlib ``http.server`` backend and a single-file
canvas-2D BEV frontend (no CDN assets — works in air-gapped environments).
"""
