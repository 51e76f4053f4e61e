from tha4_tpu.charmodel.character_model import CharacterModel

__all__ = ["CharacterModel"]
