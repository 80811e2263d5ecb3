"""Rule language: parser, AST, normalization, compiler (driver-side)."""
