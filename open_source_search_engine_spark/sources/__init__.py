"""Sources: synthetic transcript generator and testdata readers."""
