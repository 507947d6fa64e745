"""Training entry point (full optax trainer lands in train/trainer.py)."""



def main(argv):
    from .trainer import main as trainer_main
    return trainer_main(argv)
