"""Host-side analysis of benchmark results: loading, filtering, plots."""
