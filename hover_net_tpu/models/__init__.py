from .hovernet import HoVerNet, HoVerNetConfig, create_model  # noqa: F401
