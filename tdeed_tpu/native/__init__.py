"""First-party native (C++) components: JPEG decode for the frame pipeline."""
