# pipeline.perceive is exported once the full stage set exists
