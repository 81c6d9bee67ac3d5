from .trainer import main_cli

main_cli()
