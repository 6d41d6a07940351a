"""Dataflow operators of the KG-construction pipeline."""
