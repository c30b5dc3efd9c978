"""Field output (VTI/VTK), geometry import, checkpoint storage."""
