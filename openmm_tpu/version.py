"""Version info."""
short_version = "0.1.0"
version = "openmm-tpu 0.1.0"
full_version = version
git_revision = "unknown"
openmm_library_path = ""
