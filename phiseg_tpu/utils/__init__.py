"""Utilities: TensorBoard writer, image grids, misc helpers."""
