"""Scalar-function layer: XSD-regex translation and facet → Column lowering."""
