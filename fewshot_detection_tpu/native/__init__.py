from .loader import NativeImagePipe, native_available

__all__ = ["NativeImagePipe", "native_available"]
