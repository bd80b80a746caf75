"""Framework exception type, counterpart of OpenMMException
(/root/reference/openmmapi/include/openmm/OpenMMException.h)."""


class OpenMMException(Exception):
    """Raised for user errors and unrecoverable runtime conditions."""
    pass
