"""Probing subsystem: probes/heads, trainers, testers (SURVEY.md §2 #18-29)."""

from .heads import DeeperHead, LinearHead, make_head
from .probes import BaseProbe, LinearProbe, MultiTaskProbe

__all__ = ["DeeperHead", "LinearHead", "make_head", "BaseProbe",
           "LinearProbe", "MultiTaskProbe"]
