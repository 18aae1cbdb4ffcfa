"""streaming_batch ops — filled in by later milestones."""
