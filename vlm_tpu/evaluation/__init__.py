"""Evaluation layer: accuracy/MAE/confusion-matrix artifacts (SURVEY.md §2 #16)."""

from .evaluator import Evaluator
from .zero_shot import run_zero_shot

__all__ = ["Evaluator", "run_zero_shot"]
