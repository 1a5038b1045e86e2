"""End-to-end pipelines exposed through __ray_entry__ and bench.py."""
