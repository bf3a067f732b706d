"""Relational + domain operators, all lazy DataFrame transformations."""
