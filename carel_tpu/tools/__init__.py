"""Host-side tooling: dataset conversion, probes, visualization, clustering,
case analysis, HPO. TPU-free utilities mirroring the reference's script layer
(SURVEY.md §2.6-2.7, §3.5)."""
