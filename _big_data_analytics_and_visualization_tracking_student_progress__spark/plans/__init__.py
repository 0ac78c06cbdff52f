from .student_progress import flagship_progress, transcript_lookup  # noqa: F401
