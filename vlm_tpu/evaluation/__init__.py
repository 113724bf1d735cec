"""Evaluation layer: accuracy/MAE/confusion-matrix artifacts (SURVEY.md §2 #16)."""

from .evaluator import Evaluator

__all__ = ["Evaluator"]
