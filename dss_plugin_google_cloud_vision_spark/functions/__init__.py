"""Pure-Python extraction kernels (no Spark imports): HTML main-content
extraction, PDF-like layout parsing, language identification, response JSON
building. All deterministic — these are the byte-identity surface."""
