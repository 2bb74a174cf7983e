"""torchvision stand-in (torchvision is not installed in this
environment); provides only the transforms the reference CLI imports."""
